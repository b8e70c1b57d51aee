"""DUA baseline: no-gradient BN-statistic adaptation
(reference baselines/dua.py + dua_utils.py, driven from
corpus/main_eval.py:182-210).

Per video: build a batch of ``batch_size`` augmented variants (multi-
scale crop + random 0/90/180/270 rotation, rotate_batch
dua_utils.py:31-35), run a no-grad forward with BN layers updating
running statistics, then evaluate the full test set; early-stop after 3
consecutive accuracy drops (dua.py:85-88) or after ``no_vids`` videos
(1% of the stream, main_eval.py:203-205)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vitta_tpu.baselines.common import BaselineBase
from vitta_tpu.data import transforms

DUA_BATCH = 16


class DuaBaseline(BaselineBase):
    def __init__(self, model, cfg, variables):
        super().__init__(model, cfg, variables)
        self._update = jax.jit(lambda v, x: self.model.apply(
            v, x, train=False, use_running_average=False,
            update_running_stats=True, mutable=["batch_stats"])[1])
        self._fwd = jax.jit(lambda v, x: self.model.apply(v, x, train=False))

    @staticmethod
    def _rotate(clip: np.ndarray, k: int) -> np.ndarray:
        """0/90/180/270-degree rotation of (T, H, W, C) frames."""
        return np.rot90(clip, k=k, axes=(1, 2)).copy()

    def _augment_batch(self, clip: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        """One video -> (DUA_BATCH, T, S, S, 3): per variant one shared
        random multi-scale crop to the network input size, a random
        horizontal flip (get_augmentation, utils_.py:151-157:
        GroupMultiScaleCrop + GroupRandomHorizontalFlip) and a random
        0/90/180/270 rotation (rotate_batch, dua_utils.py:31-35)."""
        t, h, w, _ = clip.shape
        size = self.cfg.data.network_input_size
        clip_u8 = (clip if clip.dtype == np.uint8 else
                   np.clip(clip, 0, 255).astype(np.uint8))
        out = []
        for _ in range(DUA_BATCH):
            box = transforms.sample_multiscale_crop(w, h, (size, size), rng)
            var = transforms.crop_and_resize(clip_u8, box, (size, size))
            if rng.random() < 0.5:
                var = var[:, :, ::-1]
            out.append(self._rotate(np.ascontiguousarray(var),
                                    int(rng.integers(0, 4))))
        return np.stack(out)

    def run(self, adapt_dataset_raw, eval_dataset, batch_size: int = 1,
            no_vids: int | None = None, seed: int = 0,
            mean=None, std=None) -> float:
        """``adapt_dataset_raw`` yields per-video raw decoded uint8 frames
        (F, H, W, 3) pre-crop/normalize (the second dataset of the
        reference's DUA pair, basics.py:1330-1347); ``eval_dataset`` is
        the standard eval dataset.  Stops after ``no_vids`` videos —
        1% of the stream like the reference driver (main_eval.py:203-205,
        ``i == no_vids``); the reference's 3-consecutive-degradation early
        stop (dua.py:85-88) compares the newest accuracy against a window
        that includes itself and therefore never fires — not replicated.
        Returns the best accuracy seen (dua.py:92-95)."""
        cfg = self.cfg
        mean = mean if mean is not None else cfg.data.input_mean
        std = std if std is not None else cfg.data.input_std
        rng = np.random.default_rng(seed)
        variables = dict(self.variables)
        if no_vids is None:
            no_vids = int(len(adapt_dataset_raw) * 1 / 100)
        all_acc = []
        for i in range(len(adapt_dataset_raw)):
            clip = adapt_dataset_raw[i]
            clip = clip.frames if hasattr(clip, "frames") else clip
            batch = self._augment_batch(np.asarray(clip), rng)
            batch = transforms.normalize_clip(
                batch, mean, std, scale_255=cfg.model.arch == "tanet")
            new_stats = self._update(variables, jnp.asarray(batch, jnp.float32))
            variables = {"params": variables["params"],
                         "batch_stats": new_stats["batch_stats"]}
            acc = self.evaluate(lambda x: self._fwd(variables, x),
                                eval_dataset, batch_size)
            all_acc.append(acc)
            if i == no_vids:
                break
        return max(all_acc)
