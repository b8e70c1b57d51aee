#!/usr/bin/env python
"""ViTTA on TANet / UCF101-C level 5 — 12 shuffled corruption streams.

TPU-native counterpart of reference tta_tanet_ucf101.py.  All reference
defaults apply (utils/opts.py); required flags:

  python scripts/tta_tanet_ucf101.py \
      --model_path /path/tanet_ucf.pth.tar \
      --video_data_dir /path/level_5_ucf_val_split_1 \
      --val_vid_list '/path/list_video_perturbations/{}.txt' \
      --spatiotemp_mean_clean_file /path/list_spatiotemp_mean_*.npy \
      --spatiotemp_var_clean_file /path/list_spatiotemp_var_*.npy \
      --result_dir results/tanet_ucf101 \
      [--n_parallel_streams 8]     # adapt streams concurrently on a mesh
"""

import sys

from vitta_tpu.cli.opts import get_opts
from vitta_tpu.cli.drivers import run_corruption_sweep, run_parallel_sweep
from vitta_tpu.config import CORRUPTIONS

if __name__ == "__main__":
    args, cfg = get_opts()
    corruptions = [f"{c}_shuffled" for c in CORRUPTIONS]
    if args.corruptions:
        corruptions = list(args.corruptions)
    sweep = (run_parallel_sweep if cfg.runtime.n_parallel_streams > 1
             else run_corruption_sweep)
    results = sweep(cfg, corruptions, source_kind=args.video_source)
    print({k: [round(float(x), 3) for x in v] for k, v in results.items()})
