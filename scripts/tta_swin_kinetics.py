#!/usr/bin/env python
"""ViTTA on Video Swin-B / Kinetics-400-C (400 classes).

The reference ships UCF101 drivers only; this follows the
tta_swin_ucf101.py driver pattern with the Kinetics preset
(config.kinetics_preset: per-arch Swin overrides of
tta_swin_ucf101.py:27-40 + 400 classes per main_eval.py:39-47)."""

from vitta_tpu.cli.opts import get_opts
from vitta_tpu.cli.drivers import run_corruption_sweep, run_parallel_sweep
from vitta_tpu.config import CORRUPTIONS

if __name__ == "__main__":
    import sys
    sys.argv[1:1] = ["--arch", "videoswintransformer",
                     "--dataset", "kinetics"]
    args, cfg = get_opts()
    corruptions = [f"{c}_shuffled" for c in CORRUPTIONS]
    if args.corruptions:
        corruptions = list(args.corruptions)
    sweep = (run_parallel_sweep if cfg.runtime.n_parallel_streams > 1
             else run_corruption_sweep)
    results = sweep(cfg, corruptions, source_kind=args.video_source)
    print({k: [round(float(x), 3) for x in v] for k, v in results.items()})
