#!/usr/bin/env python
"""Convert reference torch checkpoints to native orbax checkpoints
(fast mmap reload, no torch needed at serve time).

  python scripts/convert_checkpoint.py --arch tanet \
      --model_path tanet_ucf.pth.tar --out ckpt/tanet_ucf101
"""

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", required=True,
                   choices=["tanet", "videoswintransformer", "swin2d"])
    p.add_argument("--model_path", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--num_classes", type=int, default=None)
    args = p.parse_args()

    import torch
    from vitta_tpu.adapt.train import save_checkpoint
    from vitta_tpu.utils.checkpoint import (convert_swin_checkpoint,
                                            convert_tanet_checkpoint,
                                            inflate_swin2d_checkpoint)

    sd = torch.load(args.model_path, map_location="cpu", weights_only=False)
    if args.arch == "tanet":
        variables = convert_tanet_checkpoint(sd, args.num_classes)
    elif args.arch == "videoswintransformer":
        variables = convert_swin_checkpoint(sd, args.num_classes)
    else:
        variables = inflate_swin2d_checkpoint(sd, args.num_classes)
    save_checkpoint(args.out, variables)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
