"""Importer for reference `network-snapshot-XXXXXX.pkl` checkpoints.

Replaces reference src/legacy.py (load_network_pkl) for the TPU stack:
the reference pickles LIVE torch modules whose classes carry their own source
code via torch_utils/persistence.py (persistence.py:35-130). We must NOT
execute that embedded source (untrusted content); instead a restricted
Unpickler reconstructs every persistent object as an inert `StubModule`
holding the pickled state, torch (CPU) decodes the raw tensors, and a
name-mapping layer converts the flattened state_dict into our NHWC/HWIO
flax variable trees (mirroring the name-pattern approach of
reference legacy.py:171-202).

Weight layout conversions (reference NCHW/OIHW -> ours NHWC/HWIO):
    linear   [out, in]        -> [in, out]            (transpose)
    conv2d   [O, I, kh, kw]   -> [kh, kw, I, O]
    conv1d   [O, I, k]        -> [k, I, O]
    const    [C, 4, 4] / [1, C, 4, 4] -> [4, 4, C]
    noise_const [H, W]        -> [H, W, 1]
    D-epilogue fc [out, C*4*4] -> permuted for HWC flatten order, then transposed
"""
from __future__ import annotations

import io as _io
import pickle
from typing import Any, Dict, Optional

import numpy as np


class StubModule:
    """Inert stand-in for a persistence-embedded torch module."""

    def __init__(self, meta: Dict[str, Any]):
        self.class_name = meta.get("class_name")
        self.state = meta.get("state") or {}

    def __repr__(self):
        return f"StubModule({self.class_name})"


def _reconstruct_stub(meta):
    return StubModule(meta)


class _EasyDict(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def __setattr__(self, k, v):
        self[k] = v


class SafeRefUnpickler(pickle.Unpickler):
    """Decodes reference snapshots without executing embedded source.

    torch tensor reconstruction is delegated to the real torch module (CPU);
    reference-repo classes are replaced by stubs.
    """

    _STUBBED_CALLABLES = {
        ("torch_utils.persistence", "_reconstruct_persistent_obj"): _reconstruct_stub,
        ("src.torch_utils.persistence", "_reconstruct_persistent_obj"): _reconstruct_stub,
    }
    _EASYDICT_MODULES = {"dnnlib", "src.dnnlib", "dnnlib.util", "src.dnnlib.util"}

    def find_class(self, module: str, name: str):
        if (module, name) in self._STUBBED_CALLABLES:
            return self._STUBBED_CALLABLES[(module, name)]
        if module in self._EASYDICT_MODULES and name == "EasyDict":
            return _EasyDict
        if module.startswith(("torch.", "torch_utils.", "src.torch_utils.",
                              "collections", "numpy", "builtins")) or module == "torch":
            if module.startswith(("torch_utils", "src.torch_utils")):
                # any other reference-internal symbol -> inert stub factory
                return lambda *a, **kw: StubModule(
                    {"class_name": f"{module}.{name}", "state": {"args": a, "kwargs": kw}})
            return super().find_class(module, name)
        if module.startswith(("training.", "src.training.", "metrics.", "src.metrics.")):
            return lambda *a, **kw: StubModule(
                {"class_name": f"{module}.{name}", "state": {"args": a, "kwargs": kw}})
        return super().find_class(module, name)


def load_network_pkl(path: str) -> Dict[str, Any]:
    """Load a reference snapshot -> dict with StubModule values for
    G / D / G_ema / augment_pipe plus plain entries (reference legacy.py:20-28)."""
    with open(path, "rb") as f:
        return SafeRefUnpickler(f).load()


def _to_np(x):
    try:
        import torch
        if isinstance(x, torch.Tensor):
            return x.detach().cpu().numpy()
    except ImportError:
        pass
    if isinstance(x, np.ndarray):
        return x
    return None


def flatten_module_state(obj, prefix: str = "") -> Dict[str, np.ndarray]:
    """Walk a StubModule tree (the pickled nn.Module __dict__ structure:
    _parameters / _buffers / _modules) into a flat state_dict."""
    out: Dict[str, np.ndarray] = {}
    state = obj.state if isinstance(obj, StubModule) else obj
    if not isinstance(state, dict):
        return out
    for coll in ("_parameters", "_buffers"):
        for name, val in (state.get(coll) or {}).items():
            arr = _to_np(val)
            if arr is not None:
                out[prefix + name] = arr
    for name, child in (state.get("_modules") or {}).items():
        if child is None:
            continue
        if isinstance(child, StubModule):
            out.update(flatten_module_state(child, prefix + name + "."))
        else:
            # plain torch module (e.g. nn.Sequential / nn.LSTM / nn.Embedding)
            try:
                import torch
                if isinstance(child, torch.nn.Module):
                    for n, p in child.state_dict().items():
                        out[prefix + name + "." + n] = p.detach().cpu().numpy()
                    continue
            except ImportError:
                pass
            out.update(flatten_module_state(child, prefix + name + "."))
    return out


# ------------------------- name mapping -> flax trees -------------------------

def _set(tree: Dict, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _linear(w):
    return np.ascontiguousarray(w.T)


def _conv2d(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _conv1d(w):
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))


def convert_generator_state(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """reference G state_dict -> {'params': ..., 'moving': ...} variable tree
    matching models.generator.Generator."""
    params: Dict[str, Any] = {}
    moving: Dict[str, Any] = {}
    buffers: Dict[str, Any] = {}

    for name, arr in flat.items():
        parts = name.split(".")
        if name == "mapping.w_avg":
            _set(moving, ("mapping", "w_avg"), arr.astype(np.float32))
            continue
        if parts[0] == "mapping" and parts[1].startswith("fc"):
            kind = "weight" if parts[2] == "weight" else "bias"
            val = _linear(arr) if kind == "weight" else arr
            _set(params, ("mapping", parts[1], kind), val.astype(np.float32))
            continue
        if parts[0] == "mapping" and parts[1] == "embed":
            val = _linear(arr) if parts[2] == "weight" else arr
            _set(params, ("mapping", "embed", parts[2]), val.astype(np.float32))
            continue
        if parts[0] != "synthesis":
            continue
        sub = parts[1:]
        if sub[0] == "motion_encoder":
            if sub[1] == "conv":      # conv.0 / conv.1 (nn.Sequential)
                layer = f"conv{sub[2]}"
                kind = sub[3]
                val = _conv1d(arr) if kind == "weight" else arr
                _set(params, ("synthesis", "motion_encoder", layer, kind),
                     val.astype(np.float32))
            elif sub[1] == "time_encoder":
                if sub[2] in ("freqs", "phase_scales"):
                    continue          # recomputed constants
                _set(params, ("synthesis", "motion_encoder", "time_encoder",
                              sub[2], "weight"), _linear(arr).astype(np.float32))
            elif sub[1] == "mapping":
                val = _linear(arr) if sub[3] == "weight" else arr
                _set(params, ("synthesis", "motion_encoder", "mapping", sub[2],
                              sub[3]), val.astype(np.float32))
            elif sub[1] == "rnn":
                # LSTM parameters: left unconverted in round 1 (conv strategy
                # is the StyleGAN-V default); stored raw for completeness.
                _set(buffers, ("legacy_rnn", ".".join(sub[2:])), arr)
            continue
        if sub[0].startswith("b"):
            block = sub[0]
            if sub[1] == "resample_filter" or sub[-1] == "resample_filter":
                continue              # recomputed constants
            if sub[1] == "input":     # GenInput: input.const or input.input.const
                const = arr
                if const.ndim == 4:   # [1, C, 4, 4] TemporalInput
                    const = const[0]
                _set(params, ("synthesis", block, "input", "const"),
                     np.ascontiguousarray(np.transpose(const, (1, 2, 0))).astype(np.float32))
                continue
            layer = sub[1]            # conv0 / conv1 / torgb
            if sub[2] == "affine":
                val = _linear(arr) if sub[3] == "weight" else arr
                _set(params, ("synthesis", block, layer, "affine", sub[3]),
                     val.astype(np.float32))
            elif sub[2] == "weight":
                _set(params, ("synthesis", block, layer, "weight"),
                     _conv2d(arr).astype(np.float32))
            elif sub[2] == "bias":
                _set(params, ("synthesis", block, layer, "bias"), arr.astype(np.float32))
            elif sub[2] == "noise_strength":
                _set(params, ("synthesis", block, layer, "noise_strength"),
                     arr.astype(np.float32))
            elif sub[2] == "noise_const":
                _set(buffers, ("synthesis", block, layer, "noise_const"),
                     arr[:, :, None].astype(np.float32))
            continue

    out = {"params": params}
    if moving:
        out["moving"] = moving
    if buffers:
        out["buffers"] = buffers
    return out


def convert_discriminator_state(flat: Dict[str, np.ndarray],
                                epilogue_channels: Optional[int] = None
                                ) -> Dict[str, Any]:
    """reference D state_dict -> {'params': ...} matching models.discriminator."""
    params: Dict[str, Any] = {}
    for name, arr in flat.items():
        parts = name.split(".")
        if parts[-1] == "resample_filter" or parts[-1] in ("freqs", "fourier_coefs"):
            continue
        if parts[0] == "time_encoder":
            if parts[1] == "const_embed":
                _set(params, ("time_encoder", "const_embed", "embedding"),
                     arr.astype(np.float32))
            continue
        if parts[0] == "mapping":
            if parts[1] == "embed":
                val = _linear(arr) if parts[2] == "weight" else arr
                _set(params, ("mapping", "embed", parts[2]), val.astype(np.float32))
            elif parts[1].startswith("fc"):
                val = _linear(arr) if parts[2] == "weight" else arr
                _set(params, ("mapping", parts[1], parts[2]), val.astype(np.float32))
            continue
        if parts[0] == "b4":
            layer = parts[1]
            if layer in ("conv", "fromrgb"):
                val = _conv2d(arr) if parts[2] == "weight" else arr
                _set(params, ("b4", layer, parts[2]), val.astype(np.float32))
            elif layer == "fc":
                if parts[2] == "weight" and epilogue_channels is not None:
                    # reference flattens [C,4,4] (CHW); we flatten [4,4,C]
                    C = epilogue_channels
                    w = arr.reshape(arr.shape[0], C, 4, 4).transpose(0, 2, 3, 1)
                    w = w.reshape(arr.shape[0], -1)
                    _set(params, ("b4", "fc", "weight"), _linear(w).astype(np.float32))
                else:
                    val = _linear(arr) if parts[2] == "weight" else arr
                    _set(params, ("b4", "fc", parts[2]), val.astype(np.float32))
            elif layer == "out":
                val = _linear(arr) if parts[2] == "weight" else arr
                _set(params, ("b4", "out", parts[2]), val.astype(np.float32))
            continue
        if parts[0].startswith("b"):
            block, layer = parts[0], parts[1]
            val = _conv2d(arr) if parts[2] == "weight" else arr
            _set(params, (block, layer, parts[2]), val.astype(np.float32))
            continue
    return {"params": params}
