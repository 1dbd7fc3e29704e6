from .topk import (
    cosine_topk_xla,
    cosine_topk_pallas,
    cosine_topk,
    cosine_topk_int8_exact,
    cosine_topk_int8_xla,
    quantize_db_int8,
    sharded_cosine_topk,
    apply_score_threshold,
)
from .binary import (
    binary_topk,
    binary_topk_pallas,
    binary_topk_xla,
    lane_plane_width,
    pack_signs,
    sharded_binary_topk,
)
from .ivf_scan import ivf_probe_scan
from .pq import (
    pq_decode,
    pq_encode,
    pq_topk_xla,
    sharded_pq_topk,
    train_pq,
)
from .l1 import (
    manhattan_topk_host,
    manhattan_topk_xla,
    sharded_manhattan_topk,
)
from .norm import l2_normalize
from .recommend import (
    average_query,
    sum_scores_query,
    best_score_topk,
    context_topk,
    discover_topk,
    sharded_best_score_topk,
    sharded_context_topk,
    sharded_discover_topk,
)
# NOTE: `ops.topk_int8` (two-stage overfetch+rescore int8) is a retained
# experiment superseded by `cosine_topk_int8_exact` — same capacity win,
# exact scores, no recall parameter. Import it by module path if needed;
# it is deliberately NOT part of the package's advertised search surface
# (one int8 contract: the exact kernel).
