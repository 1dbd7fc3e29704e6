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
from .norm import l2_normalize
from .topk_int8 import cosine_topk_int8, quantize_rows
