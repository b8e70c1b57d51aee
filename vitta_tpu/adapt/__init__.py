from vitta_tpu.adapt.engine import (  # noqa: F401
    TTAState,
    VittaEngine,
    flatten_taps,
    select_tap_names,
)
from vitta_tpu.adapt.optim import build_optimizer, tanet_trainable_mask  # noqa: F401
