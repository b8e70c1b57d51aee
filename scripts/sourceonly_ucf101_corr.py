#!/usr/bin/env python
"""Source-only (or any baseline) evaluation over the 12 corruptions —
counterpart of reference sourceonly_{tanet,swin}_ucf101_corr.py
(tta=False, baseline='source', batch 32, uniform-1, 1 crop).

  python scripts/sourceonly_ucf101_corr.py --arch tanet --tta false \
      --batch_size 32 --baseline source --model_path ... \
      --video_data_dir ... --val_vid_list '.../{}.txt'
"""

from vitta_tpu.cli.opts import get_opts
from vitta_tpu.cli.drivers import run_corruption_sweep
from vitta_tpu.config import CORRUPTIONS

if __name__ == "__main__":
    args, cfg = get_opts()
    corruptions = list(CORRUPTIONS)
    if args.corruptions:
        corruptions = list(args.corruptions)
    results = run_corruption_sweep(cfg, corruptions,
                                   source_kind=args.video_source)
    print({k: [round(float(x), 3) for x in v] for k, v in results.items()})
