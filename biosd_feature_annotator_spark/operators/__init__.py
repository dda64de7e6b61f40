from .extract import extract_mentions, extract_from_text, MENTION_SCHEMA  # noqa: F401
from .link import (  # noqa: F401
    link_entities, best_link, route_predicates, assemble_triples,
    term_triples, value_triples, structural_triples,
)
from .canonicalize import connected_components, canonicalize, salted_min, entity_stats  # noqa: F401
from .context import with_conversation_context  # noqa: F401
from . import dedup, similarity, textstats, multimodal  # noqa: F401
