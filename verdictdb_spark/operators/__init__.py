from .distinct import approx_count_distinct_by, hll_sketch_table  # noqa: F401
from .approx_agg import build_partials, tree_merge, sketch_agg, finalize  # noqa: F401
