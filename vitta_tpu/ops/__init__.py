from vitta_tpu.ops.stats import (  # noqa: F401
    TapStats,
    channel_stats,
    ema_update,
    cumulative_update,
)
from vitta_tpu.ops.losses import (  # noqa: F401
    compute_regularization,
    pred_consistency,
    softmax_entropy,
)
