"""Checkpoint conversion: torch state_dicts -> flax variable pytrees.

The reference loads pretrained TANet / Video Swin torch checkpoints
(corpus/main_eval.py:55-65, including ``module.`` DataParallel-prefix
detection) and precomputed source statistics stored as object-array
``.npy`` pairs in ``choose_layers`` order (corpus/basics.py:306-307,
consumed at 480-509 with ``None`` placeholders spliced in at BatchNorm1d
positions for TANet).

This module re-provides all of that for the JAX models:

* ``convert_tanet_checkpoint`` — torch TSN(ResNet50+TAM) state_dict ->
  ``{"params": ..., "batch_stats": ...}`` matching
  :class:`vitta_tpu.models.tanet.TANet`;
* ``tanet_norm_layers`` — the canonical norm-layer order of the torch
  model's ``named_modules()`` DFS, used to key reference-format stat
  files to tap names;
* ``load_reference_stats`` — reads the reference ``.npy`` pair into a
  ``{tap_name: (mean, var)}`` dict.

No torch import is required: ``.pth`` loading is done by the caller
(torch is an optional dependency of the converter CLI only).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from vitta_tpu.models.resnet import RESNET50_LAYERS


def strip_module_prefix(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Drop DataParallel's ``module.`` prefix (main_eval.py:55-65)."""
    if any(k.startswith("module.") for k in sd):
        return {k[len("module."):] if k.startswith("module.") else k: v
                for k, v in sd.items()}
    return sd


def _to_numpy(sd) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        out[k] = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
    return out


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _bn(params: dict, stats: dict, flax_path: Tuple[str, ...],
        torch_prefix: str, sd: Dict[str, np.ndarray]):
    _set(params, flax_path + ("scale",), sd[torch_prefix + ".weight"])
    _set(params, flax_path + ("bias",), sd[torch_prefix + ".bias"])
    _set(stats, flax_path + ("mean",), sd[torch_prefix + ".running_mean"])
    _set(stats, flax_path + ("var",), sd[torch_prefix + ".running_var"])


def convert_tanet_checkpoint(sd, num_classes: Optional[int] = None) -> dict:
    """Convert a reference TANet checkpoint (torch state_dict, possibly
    ``module.``-prefixed, TAM blocks stored as ``layerX.Y.net`` /
    ``layerX.Y.tam``) to flax variables for :class:`TANet`."""
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]  # full checkpoint dicts
    sd = _to_numpy(strip_module_prefix(sd))
    params: dict = {}
    stats: dict = {}

    bm = "base_model"
    # stem
    _set(params, (bm, "conv1", "kernel"),
         sd["base_model.conv1.weight"].transpose(2, 3, 1, 0))
    _bn(params, stats, (bm, "bn1"), "base_model.bn1", sd)

    has_tam = any(".tam." in k for k in sd)

    for li, (planes, blocks, _stride) in enumerate(RESNET50_LAYERS, start=1):
        for bi in range(blocks):
            tp = f"base_model.layer{li}.{bi}"
            net = f"{tp}.net" if f"{tp}.net.conv1.weight" in sd else tp
            fp = (bm, f"layer{li}_{bi}")
            for ci in (1, 2, 3):
                _set(params, fp + (f"conv{ci}", "kernel"),
                     sd[f"{net}.conv{ci}.weight"].transpose(2, 3, 1, 0))
                _bn(params, stats, fp + (f"bn{ci}",), f"{net}.bn{ci}", sd)
            if f"{net}.downsample.0.weight" in sd:
                _set(params, fp + ("downsample_conv", "kernel"),
                     sd[f"{net}.downsample.0.weight"].transpose(2, 3, 1, 0))
                _bn(params, stats, fp + ("downsample_bn",),
                    f"{net}.downsample.1", sd)
            if has_tam and f"{tp}.tam.G.0.weight" in sd:
                tamp = fp + ("tam",)
                _set(params, tamp + ("g_fc1", "kernel"),
                     sd[f"{tp}.tam.G.0.weight"].T)
                _bn(params, stats, tamp + ("g_bn",), f"{tp}.tam.G.1", sd)
                _set(params, tamp + ("g_fc2", "kernel"),
                     sd[f"{tp}.tam.G.3.weight"].T)
                _set(params, tamp + ("l_conv1", "kernel"),
                     sd[f"{tp}.tam.L.0.weight"].transpose(2, 1, 0))
                _bn(params, stats, tamp + ("l_bn",), f"{tp}.tam.L.1", sd)
                _set(params, tamp + ("l_conv2", "kernel"),
                     sd[f"{tp}.tam.L.3.weight"].transpose(2, 1, 0))

    _set(params, ("new_fc", "kernel"), sd["new_fc.weight"].T)
    _set(params, ("new_fc", "bias"), sd["new_fc.bias"])
    if num_classes is not None:
        assert params["new_fc"]["bias"].shape == (num_classes,), \
            f"checkpoint classes {params['new_fc']['bias'].shape} != {num_classes}"
    return {"params": params, "batch_stats": stats}


def tanet_norm_layers(use_tam: bool = True) -> List[Tuple[str, str]]:
    """Norm layers of TANet in the torch ``named_modules()`` DFS order used
    by ``choose_layers`` (utils/BNS_utils.py:245-259): per bottleneck the
    order is net.bn1, net.bn2, net.bn3, [downsample bn], tam.G bn1d,
    tam.L bn1d (TemporalBottleneck attribute order net -> tam,
    temporal_module.py:76-83).

    Returns ``[(tap_name, kind)]`` with kind in {"bn2d", "bn1d"}; names are
    flax paths joined with '.' relative to the model root.
    """
    out: List[Tuple[str, str]] = [("base_model.bn1", "bn2d")]
    for li, (planes, blocks, _s) in enumerate(RESNET50_LAYERS, start=1):
        for bi in range(blocks):
            p = f"base_model.layer{li}_{bi}"
            out.append((f"{p}.bn1", "bn2d"))
            out.append((f"{p}.bn2", "bn2d"))
            out.append((f"{p}.bn3", "bn2d"))
            if bi == 0:
                out.append((f"{p}.downsample_bn", "bn2d"))
            if use_tam:
                out.append((f"{p}.tam.g_bn", "bn1d"))
                out.append((f"{p}.tam.l_bn", "bn1d"))
    return out


def swin_norm_layers(depths=(2, 2, 18, 2)) -> List[Tuple[str, str]]:
    """LayerNorm order for Video Swin-B, all LN except the patch-embed one
    (corpus/basics.py:500-505): per block norm1, norm2; PatchMerging norm
    after each of stages 0-2; final backbone.norm.

    Names use the flax tap convention (``layers_2`` for torch
    ``layers.2``); ``select_tap_names`` matches reference-style dotted
    ``chosen_blocks`` against both spellings."""
    out: List[Tuple[str, str]] = []
    for si, d in enumerate(depths):
        for bi in range(d):
            p = f"backbone.layers_{si}.blocks_{bi}"
            out.append((f"{p}.norm1", "ln"))
            out.append((f"{p}.norm2", "ln"))
        if si < len(depths) - 1:
            out.append((f"backbone.layers_{si}.downsample.norm", "ln"))
    out.append(("backbone.norm", "ln"))
    return out


def convert_swin_checkpoint(sd, num_classes: Optional[int] = None,
                            depths=(2, 2, 18, 2),
                            window_size=(8, 7, 7)) -> dict:
    """Convert a Video Swin (mmaction-style) torch checkpoint to flax
    variables for :class:`vitta_tpu.models.swin.Recognizer3D`.

    Key layout per the reference checkpoints loaded at
    corpus/main_eval.py:55-65: ``backbone.patch_embed.proj``,
    ``backbone.layers.{i}.blocks.{j}.{norm1,attn.qkv,attn.proj,norm2,
    mlp.fc1,mlp.fc2}``, ``backbone.layers.{i}.downsample.{norm,reduction}``,
    ``backbone.norm``, ``cls_head.fc_cls``.  The flat ((2wd-1)(2wh-1)
    (2ww-1), nh) bias tables are reshaped to the 4D axis-split form the
    model carries (models/swin.py:relative_position_bias).
    """
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    sd = _to_numpy(strip_module_prefix(sd))
    params: dict = {}
    wd, wh, ww = window_size

    def ln(flax_path, torch_prefix):
        _set(params, flax_path + ("scale",), sd[torch_prefix + ".weight"])
        _set(params, flax_path + ("bias",), sd[torch_prefix + ".bias"])

    bb = ("backbone",)
    # patch embed: Conv3d weight (C, 3, pd, ph, pw) -> (pd, ph, pw, 3, C)
    _set(params, bb + ("patch_embed_proj", "kernel"),
         sd["backbone.patch_embed.proj.weight"].transpose(2, 3, 4, 1, 0))
    _set(params, bb + ("patch_embed_proj", "bias"),
         sd["backbone.patch_embed.proj.bias"])
    ln(bb + ("patch_embed_norm",), "backbone.patch_embed.norm")

    for li, depth in enumerate(depths):
        lp = bb + (f"layers_{li}",)
        tp = f"backbone.layers.{li}"
        for bi in range(depth):
            bp = lp + (f"blocks_{bi}",)
            tb = f"{tp}.blocks.{bi}"
            ln(bp + ("norm1",), f"{tb}.norm1")
            ln(bp + ("norm2",), f"{tb}.norm2")
            ap = bp + ("attn",)
            _set(params, ap + ("qkv", "kernel"), sd[f"{tb}.attn.qkv.weight"].T)
            _set(params, ap + ("qkv", "bias"), sd[f"{tb}.attn.qkv.bias"])
            _set(params, ap + ("proj", "kernel"), sd[f"{tb}.attn.proj.weight"].T)
            _set(params, ap + ("proj", "bias"), sd[f"{tb}.attn.proj.bias"])
            _set(params, ap + ("rpb_table",),
                 sd[f"{tb}.attn.relative_position_bias_table"].reshape(
                     2 * wd - 1, 2 * wh - 1, 2 * ww - 1, -1))
            _set(params, bp + ("mlp", "fc1", "kernel"), sd[f"{tb}.mlp.fc1.weight"].T)
            _set(params, bp + ("mlp", "fc1", "bias"), sd[f"{tb}.mlp.fc1.bias"])
            _set(params, bp + ("mlp", "fc2", "kernel"), sd[f"{tb}.mlp.fc2.weight"].T)
            _set(params, bp + ("mlp", "fc2", "bias"), sd[f"{tb}.mlp.fc2.bias"])
        if f"{tp}.downsample.norm.weight" in sd:
            ln(lp + ("downsample", "norm"), f"{tp}.downsample.norm")
            _set(params, lp + ("downsample", "reduction", "kernel"),
                 sd[f"{tp}.downsample.reduction.weight"].T)
    ln(bb + ("norm",), "backbone.norm")
    _set(params, ("cls_head", "fc_cls", "kernel"), sd["cls_head.fc_cls.weight"].T)
    _set(params, ("cls_head", "fc_cls", "bias"), sd["cls_head.fc_cls.bias"])
    if num_classes is not None:
        assert params["cls_head"]["fc_cls"]["bias"].shape == (num_classes,)
    return {"params": params, "batch_stats": {}}


def convert_videomae_checkpoint(sd, num_classes: Optional[int] = None,
                                depth: int = 12) -> dict:
    """Convert a VideoMAE fine-tuned torch checkpoint (timm-style keys:
    ``patch_embed.proj``, ``blocks.{i}.{norm1,attn.qkv,attn.proj,norm2,
    mlp.fc1,mlp.fc2}``, ``fc_norm``/``norm``, ``head``) to flax variables
    for :class:`vitta_tpu.models.videomae.VideoMAE`."""
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    sd = _to_numpy(strip_module_prefix(sd))
    params: dict = {}

    def ln(flax_path, torch_prefix):
        _set(params, flax_path + ("scale",), sd[torch_prefix + ".weight"])
        _set(params, flax_path + ("bias",), sd[torch_prefix + ".bias"])

    # Conv3d (C, 3, pt, ph, pw) -> (pt, ph, pw, 3, C)
    _set(params, ("patch_embed", "kernel"),
         sd["patch_embed.proj.weight"].transpose(2, 3, 4, 1, 0))
    _set(params, ("patch_embed", "bias"), sd["patch_embed.proj.bias"])
    for i in range(depth):
        bp = (f"blocks_{i}",)
        tb = f"blocks.{i}"
        ln(bp + ("norm1",), f"{tb}.norm1")
        ln(bp + ("norm2",), f"{tb}.norm2")
        _set(params, bp + ("attn", "qkv", "kernel"), sd[f"{tb}.attn.qkv.weight"].T)
        if f"{tb}.attn.qkv.bias" in sd:
            _set(params, bp + ("attn", "qkv", "bias"), sd[f"{tb}.attn.qkv.bias"])
        else:  # VideoMAE stores separate q/v biases with zero k bias
            q = sd.get(f"{tb}.attn.q_bias")
            vb = sd.get(f"{tb}.attn.v_bias")
            if q is not None:
                _set(params, bp + ("attn", "qkv", "bias"),
                     np.concatenate([q, np.zeros_like(q), vb]))
        _set(params, bp + ("attn", "proj", "kernel"), sd[f"{tb}.attn.proj.weight"].T)
        _set(params, bp + ("attn", "proj", "bias"), sd[f"{tb}.attn.proj.bias"])
        _set(params, bp + ("mlp", "fc1", "kernel"), sd[f"{tb}.mlp.fc1.weight"].T)
        _set(params, bp + ("mlp", "fc1", "bias"), sd[f"{tb}.mlp.fc1.bias"])
        _set(params, bp + ("mlp", "fc2", "kernel"), sd[f"{tb}.mlp.fc2.weight"].T)
        _set(params, bp + ("mlp", "fc2", "bias"), sd[f"{tb}.mlp.fc2.bias"])
    norm_key = "fc_norm" if "fc_norm.weight" in sd else "norm"
    ln(("norm",), norm_key)
    _set(params, ("head", "kernel"), sd["head.weight"].T)
    _set(params, ("head", "bias"), sd["head.bias"])
    if num_classes is not None:
        assert params["head"]["bias"].shape == (num_classes,)
    return {"params": params, "batch_stats": {}}


def inflate_swin2d_checkpoint(sd, num_classes: Optional[int] = None,
                              patch_t: int = 2, window_t: int = 8,
                              depths=(2, 2, 18, 2),
                              window_hw=(7, 7)) -> dict:
    """Inflate an *image* Swin checkpoint to Video Swin variables —
    counterpart of ``SwinTransformer3D.inflate_weights``
    (swin_transformer.py:563-614):

    * ``patch_embed.proj`` (C, 3, ph, pw) -> (C, 3, pt, ph, pw) replicated
      along time / pt;
    * ``relative_position_bias_table`` ((2wh-1)(2ww-1), nH) -> replicated
      (2wd-1) times along the temporal-offset axis;
    * everything else maps 1:1 (2D keys lack the temporal dims).
    """
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    sd = _to_numpy(strip_module_prefix(sd))
    out = {}
    for k, v in sd.items():
        if k == "patch_embed.proj.weight":
            v = np.repeat(v[:, :, None], patch_t, axis=2) / float(patch_t)
        elif k.endswith("relative_position_bias_table"):
            v = np.tile(v, (2 * window_t - 1, 1))
        elif k.endswith("relative_position_index") or "attn_mask" in k:
            continue
        out["backbone." + k] = v
    if "backbone.head.weight" in out and num_classes is not None:
        out.pop("backbone.head.weight", None)
        out.pop("backbone.head.bias", None)
    if num_classes is not None and "cls_head.fc_cls.weight" not in out:
        rng = np.random.default_rng(0)
        feat = out["backbone.norm.weight"].shape[0]
        out["cls_head.fc_cls.weight"] = rng.normal(
            0, 0.01, (num_classes, feat)).astype(np.float32)
        out["cls_head.fc_cls.bias"] = np.zeros(num_classes, np.float32)
    return convert_swin_checkpoint(out, num_classes, depths=depths,
                                   window_size=(window_t, *window_hw))


def load_reference_stats(mean_file: str, var_file: str, arch: str,
                         use_tam: bool = True,
                         include_bn1d: bool = False) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    """Load the reference's object-array ``.npy`` stat pair into
    ``{tap_name: (mean, var)}``.

    For TANet+spatiotemp/spatial the files contain one entry per
    BatchNorm2d in ``choose_layers`` order; BatchNorm1d positions get no
    entry (basics.py:488-498 splices in ``None`` placeholders — here bn1d
    taps are simply omitted from the dict).  For the temporal stat types
    the reference's candidate layers include BatchNorm1d too
    (basics.py:231-238) — pass ``include_bn1d=True``."""
    means = list(np.load(mean_file, allow_pickle=True))
    variances = list(np.load(var_file, allow_pickle=True))
    if arch == "tanet":
        layers = tanet_norm_layers(use_tam=use_tam)
        out = {}
        counter = 0
        for name, kind in layers:
            if kind == "bn2d" or include_bn1d:
                out[name] = (np.asarray(means[counter], np.float32),
                             np.asarray(variances[counter], np.float32))
                counter += 1
        assert counter == len(means), (counter, len(means))
        return out
    elif arch == "videoswintransformer":
        layers = swin_norm_layers()
        assert len(means) == len(layers), (len(means), len(layers))
        return {name: (np.asarray(m, np.float32), np.asarray(v, np.float32))
                for (name, _), m, v in zip(layers, means, variances)}
    raise NotImplementedError(arch)


def load_reference_cossim(path: str, arch: str = "tanet",
                          use_tam: bool = True,
                          depths=(2, 2, 18, 2)) -> Dict[str, np.ndarray]:
    """Load a ``list_{stat_type}_relationmap_*.npy`` file into
    ``{tap_name: sim_vec}``.

    The reference file carries one entry per norm layer in
    ``choose_layers`` order with ``None`` placeholders at layers without
    a relation map (basics.py:328-338,397-401); ``None`` entries keep
    their ``None`` so the engine can skip them like the reference
    registration does (basics.py:916)."""
    entries = list(np.load(path, allow_pickle=True))
    layers = (tanet_norm_layers(use_tam) if arch == "tanet"
              else swin_norm_layers(depths=depths))
    assert len(entries) == len(layers), (len(entries), len(layers))
    return {name: (None if e is None else np.asarray(e, np.float32))
            for (name, _), e in zip(layers, entries)}


def save_cossim(path: str, sims: Dict[str, np.ndarray], arch: str,
                use_tam: bool = True, depths=(2, 2, 18, 2)) -> None:
    """Write relation-map vectors in the reference layout: one object-
    array entry per norm layer, ``None`` where no map exists
    (basics.py:397-401)."""
    layers = (tanet_norm_layers(use_tam) if arch == "tanet"
              else swin_norm_layers(depths=depths))
    arr = np.empty(len(layers), dtype=object)
    for i, (name, _) in enumerate(layers):
        arr[i] = (np.asarray(sims[name], np.float32)
                  if sims.get(name) is not None else None)
    np.save(path, arr, allow_pickle=True)


def save_stats(path_mean: str, path_var: str, stats: Dict[str, Tuple[np.ndarray, np.ndarray]],
               arch: str, use_tam: bool = True,
               include_bn1d: bool = False, depths=(2, 2, 18, 2)) -> None:
    """Write stats in the reference's object-array layout
    (basics.py:306-307) so files interoperate both ways.  With
    ``include_bn1d`` the TANet ordering includes the TAM BatchNorm1d
    layers (the temporal stat types' candidate set, basics.py:231-238)."""
    layers = (tanet_norm_layers(use_tam) if arch == "tanet"
              else swin_norm_layers(depths=depths))
    means, variances = [], []
    for name, kind in layers:
        if arch == "tanet" and kind != "bn2d" and not include_bn1d:
            continue
        m, v = stats[name]
        means.append(np.asarray(m))
        variances.append(np.asarray(v))
    def _obj_array(items):
        # np.array(list, dtype=object) mis-broadcasts when entries share a
        # leading dimension; build the ragged array explicitly
        arr = np.empty(len(items), dtype=object)
        for i, it in enumerate(items):
            arr[i] = it
        return arr

    np.save(path_mean, _obj_array(means), allow_pickle=True)
    np.save(path_var, _obj_array(variances), allow_pickle=True)
