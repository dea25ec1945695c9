from .tables import (  # noqa: F401
    LIFTING_SETS,
    ALL_LIFTING_SIZES,
    lifting_set_index,
    load_base_graph,
    polar_reliability_sequence,
)
