"""Minimal shims letting the read-only PyTorch reference at /root/reference be
imported as a TEST ORACLE on CPU (omegaconf is not installed in this image).

The shim implements only what the reference code paths actually use:
attribute-style nested dicts, .get, OmegaConf.create / to_container.
"""
import sys
import types


class DictConfig(dict):
    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError:
            raise AttributeError(k)
        return v

    def __setattr__(self, k, v):
        self[k] = v

    def get(self, k, default=None):
        return dict.get(self, k, default)


def _wrap(obj):
    if isinstance(obj, dict):
        return DictConfig({k: _wrap(v) for k, v in obj.items()})
    if isinstance(obj, (list, tuple)):
        return type(obj)(_wrap(v) for v in obj)
    return obj


def _unwrap(obj):
    if isinstance(obj, dict):
        return {k: _unwrap(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return list(_unwrap(v) for v in obj)
    return obj


class OmegaConf:
    @staticmethod
    def create(d=None):
        return _wrap(d or {})

    @staticmethod
    def to_container(cfg, resolve=True):
        return _unwrap(cfg)


def install():
    if "omegaconf" not in sys.modules:
        mod = types.ModuleType("omegaconf")
        mod.OmegaConf = OmegaConf
        mod.DictConfig = DictConfig
        mod.ListConfig = list
        sys.modules["omegaconf"] = mod
    for p in ("/root/reference", "/root/reference/src"):
        if p not in sys.path:
            sys.path.insert(0, p)


def make_ref_cfg(**overrides):
    """The small StyleGAN-V config used by parity tests (mirrors the defaults
    of configs/model/stylegan-v.yaml at reduced dims)."""
    base = {
        "z_dim": 64, "w_dim": 64, "c_dim": 0,
        "sampling": {"num_frames_per_video": 3, "max_num_frames": 128,
                     "type": "random", "total_dists": [1, 2, 4, 8], "max_dist": 8},
        "use_noise": False,
        "input": {"type": "temporal"},
        "motion": {"z_dim": 32, "v_dim": 32, "motion_z_distance": 16,
                   "gen_strategy": "conv", "kernel_size": 11,
                   "use_fractional_t": True, "fourier": True},
        "time_enc": {"cond_type": "concat_const", "dim": 32, "min_period_len": 16,
                     "max_period_len": 1024, "phase_dropout_std": 1.0},
        "concat_res": 16, "num_frames_div_factor": 2, "dummy_c": False,
    }
    base.update(overrides)
    return _wrap(base)
