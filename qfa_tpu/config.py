"""Configuration system: yaml-backed frozen config nodes.

Re-creates the workflow of the reference's yacs-based config
(``/root/reference/QFA/config.py``) without the yacs dependency: a nested
``ConfigNode`` with attribute access, recursive ``BASE`` yaml inheritance,
``KEY.SUBKEY value`` list overrides, CLI merging and freezing. Key names are
identical (``DATA.*``, ``MODEL.*``, ``TRAIN.*``) so reference yaml configs
port over unchanged; new TPU-specific keys live under ``MESH.*`` and
``RUNTIME.*``.
"""

from __future__ import annotations

import copy
import os
from typing import Any

import yaml

__all__ = ["ConfigNode", "default_config", "load_config", "get_config"]


class ConfigNode(dict):
    """A dict with attribute access, freezing, and yaml merge support."""

    _FROZEN = "_ConfigNode__frozen"

    def __init__(self, init: dict | None = None):
        super().__init__()
        object.__setattr__(self, ConfigNode._FROZEN, False)
        if init:
            for k, v in init.items():
                self[k] = ConfigNode(v) if isinstance(v, dict) else v

    # -- attribute protocol -------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name) from None

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __setitem__(self, name, value):
        if getattr(self, ConfigNode._FROZEN):
            raise AttributeError(f"config is frozen; cannot set {name!r}")
        super().__setitem__(name, value)

    # -- freezing -----------------------------------------------------------
    def freeze(self) -> "ConfigNode":
        object.__setattr__(self, ConfigNode._FROZEN, True)
        for v in self.values():
            if isinstance(v, ConfigNode):
                v.freeze()
        return self

    def defrost(self) -> "ConfigNode":
        object.__setattr__(self, ConfigNode._FROZEN, False)
        for v in self.values():
            if isinstance(v, ConfigNode):
                v.defrost()
        return self

    def clone(self) -> "ConfigNode":
        return ConfigNode(copy.deepcopy(self.to_dict()))

    # -- merging ------------------------------------------------------------
    def merge_dict(self, other: dict) -> None:
        for k, v in other.items():
            if (
                k in self
                and isinstance(self[k], ConfigNode)
                and isinstance(v, dict)
            ):
                self[k].merge_dict(v)
            else:
                self[k] = ConfigNode(v) if isinstance(v, dict) else v

    def merge_from_file(self, path: str) -> None:
        """Merge a yaml file, honoring recursive ``BASE`` inheritance
        (paths relative to the including file, like the reference)."""
        with open(path) as f:
            loaded = yaml.safe_load(f) or {}
        for base in loaded.pop("BASE", []) or []:
            if base:
                self.merge_from_file(os.path.join(os.path.dirname(path), base))
        self.merge_dict(loaded)

    def merge_from_list(self, opts: list) -> None:
        """Merge ``[KEY.SUBKEY, value, ...]`` pairs (CLI ``--opts``)."""
        if len(opts) % 2:
            raise ValueError(f"--opts needs KEY VALUE pairs, got {opts}")
        for key, value in zip(opts[::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                node = node[p]
            leaf = parts[-1]
            old = node.get(leaf)
            node[leaf] = _coerce(value, old)

    # -- io -----------------------------------------------------------------
    def to_dict(self) -> dict:
        return {
            k: v.to_dict() if isinstance(v, ConfigNode) else v
            for k, v in self.items()
        }

    def dump(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False)


def _coerce(value: Any, old: Any) -> Any:
    """Coerce a string override to the type of the existing value."""
    if not isinstance(value, str) or old is None:
        return value
    if isinstance(old, bool):
        return value.lower() in ("1", "true", "yes", "on")
    if isinstance(old, int) and not isinstance(old, bool):
        return int(value)
    if isinstance(old, float):
        return float(value)
    return value


def default_config() -> ConfigNode:
    """Defaults mirroring the reference key-for-key
    (``/root/reference/QFA/config.py:14-63``) plus TPU-native extensions."""
    return ConfigNode(
        {
            "BASE": [""],
            "TYPE": "train",
            "SEED": 0,
            "DATA": {
                "DATA_DIR": "",
                "VALIDATION_DIR": "",
                "OUTPUT_DIR": "output",
                "CATALOG": "",
                "VALIDATION_CATALOG": "",
                "DATA_NUM": 10000,
                "VALIDATION_NUM": 1000,
                "BATCH_SIZE": 500,
                "SNR_MIN": 2.0,
                "SNR_MAX": 100.0,
                "Z_MIN": 2.0,
                "Z_MAX": 3.5,
                "NUM_MASK": 0,
                "LAMMIN": 1030.0,
                "LAMMAX": 1600.0,
                "LOGLAM_DELTA": 1e-4,
                "NPROCS": 16,
                "VALIDATION": False,
                #: strict reference workflow parity: the reference loader
                #: CONCATENATES the "validation" spectra into the training
                #: arrays (/root/reference/QFA/dataloader.py:81-85) — they
                #: are trained on and shape the mu estimate, never
                #: evaluated. Default False keeps the held-out behavior
                #: (validation spectra only scored after each epoch).
                #: Requires DATA.VALIDATION (the reference gates the
                #: concat on it); the contradictory combination raises.
                "VALIDATION_CONCAT_COMPAT": False,
            },
            "MODEL": {
                "NH": 8,
                "TAU": "becker",
                "RESUME": "",
                "COMPAT_C0_BUG": False,
            },
            "TRAIN": {
                "NEPOCHS": 500,
                "LEARNING_RATE": 1e-3,
                "WEIGHT_DECAY": 1e-1,
                "DECAY_ALPHA": 0.9,
                "DECAY_STEP": 10,
                "WINDOW_LENGTH_FOR_MU": 16,
                "SMOOTH_INTERVAL": 5,
                "SAVE_INTERVAL": 5,
                "REFERENCE_NORM": True,
                #: resume from the newest full-state checkpoint (params +
                #: Adam moments + epoch) found in OUTPUT_DIR/checkpoints.
                "AUTO_RESUME": True,
                #: trainer engine: "auto"/"pallas" pick the fused
                #: whole-epoch Pallas kernel on TPU — on a multi-device
                #: mesh that is the multi-chip whole-epoch engine (local
                #: SGD: one launch per device + one pmean per epoch,
                #: parallel/epoch_dp.py). "xla" forces the XLA scan epoch;
                #: with a mesh that is EXACT per-step DP (one gradient
                #: psum per batch, parallel/dp.py).
                "ENGINE": "auto",
                #: capacity mode: store the resident delta/error planes as
                #: bfloat16 (half the HBM footprint, ~1.5M SDSS spectra per
                #: chip; kernel arithmetic stays f32). Measured ~0.7x the
                #: f32 epoch rate on v5e — trade speed for residency.
                "BF16_PLANES": False,
                #: Pallas engine: run the heavy in-kernel contractions as
                #: bfloat16 MXU passes with f32 accumulation (~20% faster
                #: headline epochs on v5e; loss trajectory drifts ~5e-7
                #: relative over tens of epochs at production scale —
                #: gated by bench.py's paired drift check and the
                #: interpret-mode trajectory tests). Default ON: the speed
                #: mode is the production trainer. Set false for bitwise
                #: f32 loss-curve parity with the XLA path.
                "MXU_BF16": True,
                #: Pallas engine: fuse the two backward cotangent dots
                #: into ONE block-diag contraction. Bitwise-identical
                #: trajectory (the zero blocks add exact +0.0 terms) but
                #: measured speed-NEUTRAL (1.005x f32 / 1.007x bf16,
                #: docs/BWDWIDE_r05.json — the dots' cost is output-pass
                #: bound, so one wide dot pays the same as two): kept as
                #: a tested alternate lowering, not a speed mode.
                "BWD_WIDE": False,
                #: Pallas engine: epochs fused into ONE kernel launch
                #: (amortizes the fixed dispatch cost, ~+9% epoch rate on
                #: v5e at 5). Chunks auto-align to every smoothing/saving
                #: boundary so the trajectory matches 1 exactly; NaN
                #: rollback, early stop, and validation become
                #: chunk-granular. On a mesh, the replicas also average
                #: once per CHUNK instead of per epoch (local SGD with
                #: sync every N epochs — N x less ICI traffic, drifting
                #: trajectory). 1 = reference-exact cadence.
                "EPOCHS_PER_LAUNCH": 1,
                #: multi-device mesh: run trajectory-EXACT data
                #: parallelism at kernel-launch cadence
                #: (parallel/sync_dp.py) instead of the local-SGD
                #: whole-epoch engine — every optimizer step consumes the
                #: globally psum'd gradient (measured ~1.2x the plain
                #: whole-epoch engine on one device, vs ~8-12x for the
                #: per-batch TRAIN.ENGINE=xla DP cadence). No effect
                #: without a mesh. Incompatible with EPOCHS_PER_LAUNCH>1.
                "DP_EXACT": False,
                #: with DP_EXACT: batches per kernel launch. 1 = one
                #: launch + one fused psum per optimizer step (fully
                #: exact on any mesh); K>1 = interior batches update
                #: locally and replicas re-sync every K batches (still
                #: exact on one device; local-SGD drift within windows on
                #: a real mesh).
                "BATCHES_PER_LAUNCH": 1,
            },
            # TPU-native extensions
            "MESH": {
                "DATA_AXIS": -1,  #: -1 = all local devices on the data axis
            },
            "RUNTIME": {
                "DEBUG_NANS": False,
                "PROFILE_DIR": "",
                #: predict mode: write one consolidated predictions.npz
                #: (stacked arrays + source paths) instead of the
                #: reference's one-file-per-spectrum layout — millions of
                #: files at survey scale.
                "CONSOLIDATED_PREDICT": False,
            },
        }
    )


def load_config(
    cfg_file: str | None = None, opts: list | None = None
) -> ConfigNode:
    """Build the frozen run config from defaults + yaml + overrides."""
    cfg = default_config()
    if cfg_file:
        cfg.merge_from_file(cfg_file)
    if opts:
        cfg.merge_from_list(list(opts))
    return cfg.freeze()


def get_config(args) -> ConfigNode:
    """argparse-namespace entry point mirroring the reference
    (``/root/reference/QFA/config.py:80-150``): yaml first, then ``--opts``,
    then individual CLI flags."""
    cfg = default_config()
    if getattr(args, "cfg", None):
        cfg.merge_from_file(args.cfg)
    if getattr(args, "opts", None):
        cfg.merge_from_list(list(args.opts))

    flag_map = {
        "type": ("TYPE",),
        "seed": ("SEED",),
        "n_epochs": ("TRAIN", "NEPOCHS"),
        "learning_rate": ("TRAIN", "LEARNING_RATE"),
        "weight_decay": ("TRAIN", "WEIGHT_DECAY"),
        "decay_alpha": ("TRAIN", "DECAY_ALPHA"),
        "decay_step": ("TRAIN", "DECAY_STEP"),
        "data_dir": ("DATA", "DATA_DIR"),
        "validation_dir": ("DATA", "VALIDATION_DIR"),
        "output_dir": ("DATA", "OUTPUT_DIR"),
        "catalog": ("DATA", "CATALOG"),
        "validation_catalog": ("DATA", "VALIDATION_CATALOG"),
        "data_num": ("DATA", "DATA_NUM"),
        "validation_num": ("DATA", "VALIDATION_NUM"),
        "batch_size": ("DATA", "BATCH_SIZE"),
        "snr_min": ("DATA", "SNR_MIN"),
        "snr_max": ("DATA", "SNR_MAX"),
        "z_min": ("DATA", "Z_MIN"),
        "z_max": ("DATA", "Z_MAX"),
        "num_mask": ("DATA", "NUM_MASK"),
        "nprocs": ("DATA", "NPROCS"),
        "validation": ("DATA", "VALIDATION"),
        "nh": ("MODEL", "NH"),
        "tau": ("MODEL", "TAU"),
        "resume": ("MODEL", "RESUME"),
    }
    for flag, path in flag_map.items():
        value = getattr(args, flag, None)
        # `is not None` (not truthiness): explicit falsy values like
        # --snr_min 0 or --z_min 0 must override the defaults too.
        if value is not None:
            node = cfg
            for p in path[:-1]:
                node = node[p]
            node[path[-1]] = value
    return cfg.freeze()
