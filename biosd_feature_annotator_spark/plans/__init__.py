from .pipeline import annotate  # noqa: F401
from .materialize import run_annotate, materialize_graph, purge_run, read_manifests  # noqa: F401
