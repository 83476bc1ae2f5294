from .segment import (  # noqa: F401
    scatter_add,
    scatter_max,
    segment_softmax,
    per_dst_relation_counts,
    take_rows,
    take_rows_matbwd,
)
from .relmatmul import relation_matmul  # noqa: F401
from .pallas.segsum import sorted_segment_sum  # noqa: F401
