from vitta_tpu.models.tanet import TANet  # noqa: F401


def get_model(cfg):
    """Model-zoo dispatch (reference corpus/basics.py:1447-1493)."""
    arch = cfg.model.arch
    if arch == "tanet":
        return TANet(num_classes=cfg.model.num_classes,
                     clip_length=cfg.data.clip_length,
                     dropout=cfg.model.dropout,
                     stat_types=cfg.tta.tap_stat_types(),
                     dtype=cfg.model.compute_dtype)
    if arch == "videoswintransformer":
        from vitta_tpu.models.swin import Recognizer3D
        return Recognizer3D(
            num_classes=cfg.model.num_classes,
            patch_size=cfg.model.patch_size,
            window_size=cfg.model.window_size,
            embed_dim=cfg.model.embed_dim,
            depths=cfg.model.depths,
            num_heads=cfg.model.num_heads,
            stat_types=cfg.tta.tap_stat_types(),
        )
    if arch.startswith("i3d_resnet"):
        from vitta_tpu.models.i3d import I3DResNet
        depth = int(arch.replace("i3d_resnet", ""))
        return I3DResNet(num_classes=cfg.model.num_classes, depth=depth)
    if arch == "r2plus1d":
        from vitta_tpu.models.r2plus1d import R2Plus1D
        return R2Plus1D(num_classes=cfg.model.num_classes)
    if arch == "i3d_incep":
        from vitta_tpu.models.i3d_incep import InceptionI3d
        return InceptionI3d(num_classes=cfg.model.num_classes)
    if arch == "videomae":
        from vitta_tpu.models.videomae import VideoMAE
        return VideoMAE(num_classes=cfg.model.num_classes)
    raise NotImplementedError(f"arch={arch}")
