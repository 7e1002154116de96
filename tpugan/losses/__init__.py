from tpugan.losses.adversarial import (  # noqa: F401
    bce,
    bce_with_logits,
    mse,
    l1,
    cross_entropy_on_softmax,
    cross_entropy_logits,
    nll_from_log_probs,
    boundary_seeking,
    pullaway,
    kl_divergence,
)
