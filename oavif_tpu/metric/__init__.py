from .ssimulacra2 import (  # noqa: F401
    compute_ssimulacra2,
    compute_ssimulacra2_batch,
    make_ref_scorer,
    ssimulacra2_precompute_ref,
)
