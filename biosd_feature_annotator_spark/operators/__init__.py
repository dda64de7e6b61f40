from .extract import extract_mentions, MENTION_SCHEMA  # noqa: F401
from .link import link_entities, route_predicates, best_link  # noqa: F401
from .canonicalize import connected_components, canonicalize  # noqa: F401
