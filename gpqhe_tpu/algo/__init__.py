"""Homomorphic algorithm layer (ref: src/he-algo.c, SURVEY.md §1 L4)."""

from .linalg import (  # noqa: F401
    GemvPlan, HoistedGemvPlan, gemv, gemv_hoisted, he_idx, he_nrm2, he_sum,
    zrotdiag)
from .nonlinear import (  # noqa: F401
    he_cmp, he_cmppt, he_exp, he_inv, he_log, he_sigmoid, he_sqrt)
