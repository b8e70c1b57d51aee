#!/usr/bin/env python
"""Source spatiotemporal statistics precompute over the clean training
list — counterpart of reference
compute_stats/compute_spatiotemp_stats_clean_train_{tanet,swin}.py
(batch 32, deterministic eval pipeline, clean data).

  python scripts/compute_stats.py --arch tanet --batch_size 32 \
      --model_path ... --video_data_dir ... --val_vid_list train_list.txt \
      --result_dir stats_out
"""

from vitta_tpu.cli.opts import get_opts
from vitta_tpu.cli.main_eval import run_compute_stats

if __name__ == "__main__":
    args, cfg = get_opts()
    paths = run_compute_stats(cfg, source_kind=args.video_source,
                              compute_stat=args.compute_stat or "mean_var")
    print(paths)
