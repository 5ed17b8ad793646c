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

import pickle
from typing import Any, Dict, Optional

import numpy as np


class StubModule:
    """Inert stand-in for a persistence-embedded torch module."""

    def __init__(self, meta: Optional[Dict[str, Any]] = None):
        meta = meta or {}
        self.class_name = meta.get("class_name")
        self.state = meta.get("state") or {}

    def __setstate__(self, state):
        # plain-pickled (non-persistence) reference objects land here
        self.state = state if isinstance(state, dict) else {"state": state}

    def __repr__(self):
        return f"StubModule({self.class_name})"


def _reconstruct_stub(meta):
    return StubModule(meta)


_stub_types: Dict[tuple, type] = {}


def _stub_type(module: str, name: str) -> type:
    """A real CLASS (NEWOBJ-compatible) standing in for a reference symbol."""
    key = (module, name)
    if key not in _stub_types:
        cls = type(name, (StubModule,), {"_stub_origin": f"{module}.{name}"})
        _stub_types[key] = cls
    return _stub_types[key]


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
        if (module in ("dnnlib.tflib.network", "src.dnnlib.tflib.network")
                and name == "Network"):
            from .legacy_tf import TFNetworkStub   # TF-era pickle
            return TFNetworkStub
        if module.startswith(("torch.", "torch_utils.", "src.torch_utils.",
                              "collections", "numpy", "builtins")) or module == "torch":
            if module.startswith(("torch_utils", "src.torch_utils")):
                # any other reference-internal symbol -> inert stub type
                return _stub_type(module, name)
            return super().find_class(module, name)
        if module.startswith(("training.", "src.training.", "metrics.", "src.metrics.")):
            return _stub_type(module, name)
        return super().find_class(module, name)


def load_network_pkl(path: str) -> Dict[str, Any]:
    """Load a reference snapshot -> dict with StubModule values for
    G / D / G_ema / augment_pipe plus plain entries (reference legacy.py:20-28).
    Legacy TensorFlow pickles (a 3-tuple of tflib Networks) are normalized to
    the same dict shape with TFNetworkStub values (reference legacy.py:24-29);
    import_reference_snapshot converts them."""
    with open(path, "rb") as f:
        data = SafeRefUnpickler(f).load()
    from .legacy_tf import is_tf_pickle
    if is_tf_pickle(data):
        tf_G, tf_D, tf_Gs = data
        data = {"G": tf_G, "D": tf_D, "G_ema": tf_Gs,
                "training_set_kwargs": None, "augment_pipe": None}
    return data


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
    """Walk a module tree (the pickled nn.Module __dict__ structure:
    _parameters / _buffers / _modules) into a flat state_dict.

    Handles StubModule nodes (whose state carries the pickled __dict__) and
    plain torch modules (e.g. nn.Sequential wrappers whose CHILDREN may again
    be stubs — so torch's own state_dict() cannot be used)."""
    out: Dict[str, np.ndarray] = {}
    if isinstance(obj, StubModule):
        state = obj.state
    elif isinstance(obj, dict):
        state = obj
    else:
        state = getattr(obj, "__dict__", None)   # plain torch module
    if not isinstance(state, dict):
        return out
    for coll in ("_parameters", "_buffers"):
        for name, val in (state.get(coll) or {}).items():
            arr = _to_np(val)
            if arr is not None:
                out[prefix + name] = arr
    for name, child in (state.get("_modules") or {}).items():
        if child is not None:
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


def convert_lstm_state(rnn_flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """torch nn.LSTM (single layer, unidirectional) -> flax OptimizedLSTMCell.

    torch packs the four gates as row blocks ordered (i, f, g, o) in
    weight_ih_l0 [4H, In] / weight_hh_l0 [4H, H] and keeps TWO bias vectors
    that are summed in the cell math (reference motion.py:44-48 relies on
    stock nn.LSTM). flax keeps per-gate Dense kernels [In, H] named
    ii/if/ig/io (no bias) and hi/hf/hg/ho (with bias), same gate equations,
    so: kernel = block.T, bias = bias_ih[block] + bias_hh[block].
    """
    w_ih = rnn_flat["weight_ih_l0"]
    w_hh = rnn_flat["weight_hh_l0"]
    b_ih = rnn_flat.get("bias_ih_l0")
    b_hh = rnn_flat.get("bias_hh_l0")
    H = w_hh.shape[1]
    cell: Dict[str, Any] = {}
    for g, gate in enumerate(("i", "f", "g", "o")):
        blk = slice(g * H, (g + 1) * H)
        cell["i" + gate] = {"kernel": _linear(w_ih[blk]).astype(np.float32)}
        hk = {"kernel": _linear(w_hh[blk]).astype(np.float32)}
        if b_ih is not None:
            hk["bias"] = (b_ih[blk] + (b_hh[blk] if b_hh is not None else 0)
                          ).astype(np.float32)
        cell["h" + gate] = hk
    return {"OptimizedLSTMCell_0": cell}


def convert_generator_state(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """reference G state_dict -> {'params': ..., 'moving': ...} variable tree
    matching models.generator.Generator."""
    params: Dict[str, Any] = {}
    moving: Dict[str, Any] = {}
    buffers: Dict[str, Any] = {}
    rnn_raw: Dict[str, np.ndarray] = {}

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
                rnn_raw[".".join(sub[2:])] = arr   # converted after the loop
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

    if rnn_raw:
        _set(params, ("synthesis", "motion_encoder", "rnn"),
             convert_lstm_state(rnn_raw))

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


def import_reference_snapshot(path: str, gen_template=None, disc_template=None,
                              epilogue_channels: Optional[int] = None):
    """Weights-only import of a reference network-snapshot pickle for
    transfer learning (reference resume_pkl semantics, train.py:283-317 +
    training_loop.py:167-177: partial copy, require_all=False).

    Returns {'G': variables|None, 'G_ema': variables|None, 'D': variables|None}
    with converted trees; entries whose stubs are absent are None. Templates,
    when given, receive a name-matched partial copy so missing/new parameters
    keep their fresh initialization.
    """
    from .checkpoint import copy_params
    from .legacy_tf import (TFNetworkStub, convert_tf_discriminator_state,
                            convert_tf_generator_state)

    data = load_network_pkl(path)
    out = {}
    for key in ("G", "G_ema", "D"):
        stub = data.get(key)
        if isinstance(stub, TFNetworkStub):
            if key == "D":
                conv, _ = convert_tf_discriminator_state(stub)
                template = disc_template
            else:
                conv, _ = convert_tf_generator_state(stub)
                template = gen_template
            if template is not None:
                conv = {coll: copy_params(conv.get(coll, {}), template[coll])
                        for coll in template}
            out[key] = conv
            continue
        if not isinstance(stub, StubModule):
            out[key] = None
            continue
        flat = flatten_module_state(stub)
        if key == "D":
            conv = convert_discriminator_state(
                flat, epilogue_channels=epilogue_channels)
            template = disc_template
        else:
            conv = convert_generator_state(flat)
            template = gen_template
        if template is not None:
            conv = {coll: copy_params(conv.get(coll, {}), template[coll])
                    for coll in template}
        out[key] = conv
    return out


def infer_generator_config(stub: StubModule):
    """Reconstruct a models.GeneratorConfig from the init-args capture that
    persistence embeds in every snapshot (reference persistence.py:103-116 —
    the part of source-embedding worth keeping)."""
    from ..models.config import (GeneratorConfig, MotionConfig,
                                 SamplingConfig, TimeEncConfig)

    kw = dict(stub.state.get("_init_kwargs") or {})
    args = list(stub.state.get("_init_args") or [])
    cfg = dict(kw.get("cfg") or {})
    syn = dict(kw.get("synthesis_kwargs") or {})
    mapping_kwargs = dict(kw.get("mapping_kwargs") or {})
    motion = dict(cfg.get("motion") or {})
    time_enc = dict(cfg.get("time_enc") or {})
    samp = dict(cfg.get("sampling") or {})

    sampling = SamplingConfig(
        type=samp.get("type", "random"),
        num_frames_per_video=int(samp.get("num_frames_per_video", 3)),
        max_num_frames=int(samp.get("max_num_frames", 1024)),
        fps=float(samp.get("fps", 25)),
        total_dists=tuple(samp["total_dists"]) if samp.get("total_dists") else None,
        max_dist=samp.get("max_dist", 32))
    num_fp16_res = int(syn.get("num_fp16_res", 0))
    return GeneratorConfig(
        w_dim=int(kw.get("w_dim", 512)),
        z_dim=int(cfg.get("z_dim", kw.get("w_dim", 512))),
        c_dim=int(kw.get("c_dim", 0)),
        img_resolution=int(kw.get("img_resolution", 256)),
        img_channels=int(kw.get("img_channels", 3)),
        channel_base=int(syn.get("channel_base", 32768)),
        channel_max=int(syn.get("channel_max", 512)),
        num_bf16_res=num_fp16_res,
        conv_clamp=syn.get("conv_clamp"),
        use_noise=bool(cfg.get("use_noise", False)),
        input_type=(cfg.get("input") or {}).get("type", "temporal"),
        mapping_layers=int(mapping_kwargs.get("num_layers", 8)),
        motion=MotionConfig(
            z_dim=int(motion.get("z_dim", 512)),
            v_dim=int(motion.get("v_dim", 512)),
            motion_z_distance=int(motion.get("motion_z_distance", 16)),
            gen_strategy=motion.get("gen_strategy", "conv"),
            kernel_size=int(motion.get("kernel_size", 11)),
            use_fractional_t=bool(motion.get("use_fractional_t", True)),
            fourier=bool(motion.get("fourier", True))),
        time_enc=TimeEncConfig(
            cond_type=time_enc.get("cond_type", "concat_const"),
            dim=int(time_enc.get("dim", 256)),
            min_period_len=int(time_enc.get("min_period_len", 16)),
            max_period_len=int(time_enc.get("max_period_len", 1024))),
        sampling=sampling)
