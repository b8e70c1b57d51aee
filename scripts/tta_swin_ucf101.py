#!/usr/bin/env python
"""ViTTA on Video Swin-B / UCF101-C — reference tta_swin_ucf101.py
counterpart (its overrides: clip 16, 1 clip, frame_uniform, scale 224,
lr 1e-5, lambda_pred_consis 0.05, momentum_mvg 0.05, chosen blocks
backbone.layers.2/3 + backbone.norm — all defaults of the swin preset)."""

from vitta_tpu.cli.opts import get_opts
from vitta_tpu.cli.drivers import run_corruption_sweep, run_parallel_sweep
from vitta_tpu.config import CORRUPTIONS

if __name__ == "__main__":
    import sys
    sys.argv.insert(1, "--arch")
    sys.argv.insert(2, "videoswintransformer")
    args, cfg = get_opts()
    corruptions = [f"{c}_shuffled" for c in CORRUPTIONS]
    if args.corruptions:
        corruptions = list(args.corruptions)
    sweep = (run_parallel_sweep if cfg.runtime.n_parallel_streams > 1
             else run_corruption_sweep)
    results = sweep(cfg, corruptions, source_kind=args.video_source)
    print({k: [round(float(x), 3) for x in v] for k, v in results.items()})
