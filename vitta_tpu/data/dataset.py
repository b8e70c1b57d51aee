"""Video datasets producing static-shaped numpy batches.

Functional re-design of ``Video_TANetDataSet``
(models/tanet_models/video_dataset.py:28-358) and ``Video_SwinDataset``
(models/videoswintransformer_models/video_dataset.py:8-112): a dataset
is an indexable of per-video samples; all dynamism (frame counts, view
sampling) stays on the host, the device always sees
``(n_views, T, S, S, 3)`` float32.

dataset_type:
* ``'tta'``  — augmented views (n_augmented_views x clip_len frames,
  per-view random spatial crop when if_spatial_rand_cropping);
* ``'eval'`` — deterministic views (test sampling x center crop or
  3-crop), used for the lock-step inference loader
  (corpus/basics.py:432-453).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from vitta_tpu.config import VittaConfig
from vitta_tpu.data import sampling, transforms
from vitta_tpu.data.records import VideoRecord, parse_list_file
from vitta_tpu.data.video_reader import VideoSource


@dataclass
class Sample:
    frames: np.ndarray   # (n_views, T, S, S, 3) float32 normalized
    label: int
    index: int


class TANetVideoDataset:
    def __init__(self, cfg: VittaConfig, source: VideoSource,
                 records: Optional[List[VideoRecord]] = None,
                 dataset_type: str = "eval", seed: int = 0):
        d, t = cfg.data, cfg.tta
        self.cfg = cfg
        self.source = source
        self.dataset_type = dataset_type
        if records is None:
            records = parse_list_file(d.val_vid_list, filter_short=True,
                                      debug=d.debug, debug_vid=d.debug_vid)
        self.records = records
        self.rng = np.random.default_rng(seed)
        self.clip_len = d.clip_length
        self.input_size = d.network_input_size
        self.scale_size = d.scale_size
        self.n_views = t.n_augmented_views
        self.view_style = t.tta_view_sample_style
        self.spatial_rand = t.if_spatial_rand_cropping
        self.sample_style = d.sample_style
        self.test_crops = d.test_crops
        self.mean, self.std = d.input_mean, d.input_std

    def __len__(self):
        return len(self.records)

    def _decode(self, rec: VideoRecord, indices: np.ndarray) -> np.ndarray:
        return self.source.get_batch(rec.path, indices)

    def _tta_item(self, rec: VideoRecord) -> np.ndarray:
        idx = sampling.sample_tta_views(rec.num_frames, self.clip_len,
                                        self.view_style, self.n_views, self.rng)
        frames = self._decode(rec, idx)          # (V*T or T, H, W, 3)
        if idx.shape[0] == self.clip_len:        # single-clip styles
            frames = np.tile(frames, (self.n_views, 1, 1, 1))
        views = frames.reshape(self.n_views, self.clip_len, *frames.shape[1:])
        if self.spatial_rand:
            views = transforms.subgroupwise_multiscale_crop(
                views, self.input_size, self.rng)
        else:
            views = np.stack([transforms.scale_center_crop(
                v, self.scale_size, self.input_size) for v in views])
        return transforms.normalize_clip(views, self.mean, self.std)

    def _eval_item(self, rec: VideoRecord) -> np.ndarray:
        idx = sampling.sample_test(rec.num_frames, self.clip_len, self.sample_style)
        n_clips = idx.shape[0] // self.clip_len
        frames = self._decode(rec, idx)
        clips = frames.reshape(n_clips, self.clip_len, *frames.shape[1:])
        out = []
        for clip in clips:
            if self.test_crops == 3:
                out.append(transforms.full_res_3crop(
                    clip, self.input_size, self.scale_size))
            else:
                out.append(transforms.scale_center_crop(
                    clip, self.scale_size, self.input_size)[None])
        views = np.concatenate(out, axis=0)      # (n_clips*crops, T, S, S, 3)
        return transforms.normalize_clip(views, self.mean, self.std)

    def __getitem__(self, i: int) -> Sample:
        rec = self.records[i]
        if self.dataset_type == "tta":
            frames = self._tta_item(rec)
        else:
            frames = self._eval_item(rec)
        return Sample(frames=frames.astype(np.float32), label=rec.label, index=i)


class PairedTTADataset:
    """Lock-step (tta views, eval clip) pairs of the same video — the
    reference iterates two DataLoaders in parallel (basics.py:475, 693)."""

    def __init__(self, cfg: VittaConfig, source: VideoSource,
                 records: Optional[List[VideoRecord]] = None, seed: int = 0,
                 dataset_cls=TANetVideoDataset):
        self.tta = dataset_cls(cfg, source, records, dataset_type="tta", seed=seed)
        self.eval = dataset_cls(cfg, source, self.tta.records, dataset_type="eval",
                                seed=seed + 1)

    def __len__(self):
        return len(self.tta)

    def __getitem__(self, i: int):
        a, b = self.tta[i], self.eval[i]
        return a.frames, b.frames, np.asarray([a.label], np.int32)
