#!/usr/bin/env python
"""ViTTA on Video Swin-B / SSv2-C (Something-Something-v2, 174 classes).

The reference ships UCF101 drivers only; this follows the
tta_swin_ucf101.py driver pattern with the SSv2 preset
(config.ssv2_preset: per-arch Swin overrides of tta_swin_ucf101.py:27-40
+ 174 classes per main_eval.py:39-47; SSv2's flip label map,
utils_.py:134-142, applies in the augmentation paths that draw flips —
the live TTA view pipeline never flips)."""

from vitta_tpu.cli.opts import get_opts
from vitta_tpu.cli.drivers import run_corruption_sweep, run_parallel_sweep
from vitta_tpu.config import CORRUPTIONS

if __name__ == "__main__":
    import sys
    sys.argv[1:1] = ["--arch", "videoswintransformer",
                     "--dataset", "somethingv2"]
    args, cfg = get_opts()
    corruptions = [f"{c}_shuffled" for c in CORRUPTIONS]
    if args.corruptions:
        corruptions = list(args.corruptions)
    sweep = (run_parallel_sweep if cfg.runtime.n_parallel_streams > 1
             else run_corruption_sweep)
    results = sweep(cfg, corruptions, source_kind=args.video_source)
    print({k: [round(float(x), 3) for x in v] for k, v in results.items()})
