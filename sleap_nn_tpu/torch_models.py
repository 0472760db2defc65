"""Import reference (PyTorch Lightning) checkpoints into flax param trees.

The reference framework saves ``best.ckpt`` files: zip-serialized torch
checkpoints whose ``state_dict`` keys carry descriptive block names
(``model.backbone.encoders.0.encoder_stack.0.blocks.stack0_enc0_conv0.weight``,
reference: sleap_nn/architectures/encoder_decoder.py:114,439,499 and
heads.py:519-531). Those leaf names map 1:1 onto this package's flax module
tree, so importing is a name rewrite plus layout transposes:

- conv weights: torch OIHW -> flax HWIO
- transposed-conv weights: torch (in, out, kh, kw) -> flax (kh, kw, in, out)
  with a spatial flip; combined with the "torch" ``trans_conv_phase`` in
  :mod:`sleap_nn_tpu.models.encoder_decoder` this reproduces
  ``ConvTranspose2d(k, s=2, padding=1, output_padding=1)`` exactly.
- linear weights: torch (out, in) -> flax (in, out)

Unpickling does NOT import reference code: Lightning stores omegaconf/config
objects in the checkpoint payload, which we resolve to inert stub classes via
a tolerant unpickler (only the tensor ``state_dict`` is consumed).
"""

from __future__ import annotations

import pickle
import re
import types
import zipfile
from pathlib import Path
from typing import Any, Dict, Tuple

import numpy as np

__all__ = [
    "is_torch_checkpoint",
    "load_torch_state_dict",
    "torch_state_to_flax",
    "load_torch_checkpoint_params",
]


def is_torch_checkpoint(path) -> bool:
    """True if ``path`` is a torch zip-serialized checkpoint file."""
    path = Path(path)
    return path.is_file() and zipfile.is_zipfile(path)


class _Stub:
    """Inert stand-in for unimportable classes inside checkpoint payloads."""

    def __init__(self, *args, **kwargs):
        pass

    def __setstate__(self, state):
        pass


class _TolerantUnpickler(pickle.Unpickler):
    """Unpickler that substitutes stubs for missing modules/classes.

    Reference checkpoints embed omegaconf containers and sleap_nn config
    dataclasses in ``hyper_parameters``/``config``; neither package is
    importable here and neither is needed — only ``state_dict`` matters.
    """

    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except (ModuleNotFoundError, AttributeError):
            return type(name, (_Stub,), {"__module__": module})


def load_torch_state_dict(path) -> Dict[str, np.ndarray]:
    """Load a torch ``.ckpt``/``.pt`` file and return state_dict as numpy."""
    import torch

    pickle_module = types.ModuleType("sleap_nn_tpu._tolerant_pickle")
    pickle_module.Unpickler = _TolerantUnpickler
    pickle_module.load = pickle.load
    pickle_module.loads = pickle.loads
    payload = torch.load(
        str(path), map_location="cpu", pickle_module=pickle_module, weights_only=False
    )
    state = payload.get("state_dict", payload) if isinstance(payload, dict) else payload
    out = {}
    for key, value in state.items():
        if hasattr(value, "detach"):
            out[key] = np.asarray(value.detach().cpu().numpy())
    return out


_BACKBONE_PATTERNS: Tuple[Tuple[re.Pattern, Any], ...] = (
    # stack0_enc0_conv1
    (
        re.compile(r"^stack(\d+)_enc(\d+)_conv(\d+)$"),
        lambda m: ("backbone", f"stack{m[1]}_enc", f"enc{m[2]}", f"conv{m[3]}"),
    ),
    # stack0_enc4_middle_expand_conv0 / stack0_enc5_middle_contract_conv0
    (
        re.compile(r"^stack(\d+)_enc\d+_middle_(expand|contract)_conv(\d+)$"),
        lambda m: ("backbone", f"stack{m[1]}_middle_{m[2]}", f"conv{m[3]}"),
    ),
    # stack0_dec0_s8_to_s4_trans_conv
    (
        re.compile(r"^stack(\d+)_dec(\d+)_(s\d+_to_s\d+)_trans_conv$"),
        lambda m: ("backbone", f"stack{m[1]}_dec", f"dec{m[2]}_{m[3]}", "trans_conv"),
    ),
    # stack0_dec0_s8_to_s4_refine_conv0
    (
        re.compile(r"^stack(\d+)_dec(\d+)_(s\d+_to_s\d+)_refine_conv(\d+)$"),
        lambda m: (
            "backbone",
            f"stack{m[1]}_dec",
            f"dec{m[2]}_{m[3]}",
            f"refine_conv{m[4]}",
        ),
    ),
    # stem0_conv0 (stem blocks precede the encoder)
    (
        re.compile(r"^stem(\d+)_conv(\d+)$"),
        lambda m: ("backbone", "stem", f"stem{m[1]}", f"conv{m[2]}"),
    ),
)


def _flax_path_for(torch_key: str) -> Tuple[Tuple[str, ...], str]:
    """Map one torch state_dict key to (flax tree path, leaf kind).

    Leaf kind is one of ``conv_kernel``, ``trans_conv_kernel``,
    ``dense_kernel``, ``bias``.
    """
    parts = torch_key.split(".")
    if parts[0] == "model":
        parts = parts[1:]
    leaf = parts[-1]
    if leaf not in ("weight", "bias"):
        raise KeyError(f"unsupported leaf {leaf!r} in {torch_key!r}")

    if parts[0] == "backbone":
        block_name = parts[-2]
        for pattern, build in _BACKBONE_PATTERNS:
            m = pattern.match(block_name)
            if m:
                path = build(m)
                kind = "trans_conv_kernel" if path[-1] == "trans_conv" else "conv_kernel"
                if leaf == "bias":
                    return path + ("bias",), "bias"
                return path + ("kernel",), kind
        raise KeyError(f"unrecognized backbone block {block_name!r} in {torch_key!r}")

    if parts[0] == "head_layers":
        # head_layers.{i}.{HeadName}.0.{weight|bias}  -> 1x1 conv head
        # head_layers.{i}.pre_classification{j}_fc.*  -> ClassVectors FC stack
        # head_layers.{i}.ClassVectorsHead.{weight|bias} -> ClassVectors logits
        name = parts[2]
        fc = re.match(r"^pre_classification(\d+)_fc$", name)
        if fc:
            path = ("ClassVectorsHead", f"fc{fc.group(1)}")
            kind = "dense_kernel" if leaf == "weight" else "bias"
            return path + ("kernel" if leaf == "weight" else "bias",), kind
        if name == "ClassVectorsHead" and parts[3] in ("weight", "bias"):
            kind = "dense_kernel" if leaf == "weight" else "bias"
            return ("ClassVectorsHead", "logits", "kernel" if leaf == "weight" else "bias"), kind
        # conv head: {HeadName}.{idx}.weight
        path = (name, "head_conv")
        if leaf == "bias":
            return path + ("bias",), "bias"
        return path + ("kernel",), "conv_kernel"

    raise KeyError(f"unrecognized torch key {torch_key!r}")


def _transform(value: np.ndarray, kind: str) -> np.ndarray:
    if kind == "bias":
        return value
    if kind == "conv_kernel":
        return np.ascontiguousarray(value.transpose(2, 3, 1, 0))  # OIHW -> HWIO
    if kind == "trans_conv_kernel":
        # torch (in, out, kh, kw) -> flax (kh, kw, in, out) with spatial flip;
        # exact ConvTranspose2d parity under trans_conv_phase="torch".
        return np.ascontiguousarray(value[:, :, ::-1, ::-1].transpose(2, 3, 0, 1))
    if kind == "dense_kernel":
        return np.ascontiguousarray(value.transpose(1, 0))  # (out, in) -> (in, out)
    raise KeyError(kind)


def torch_state_to_flax(state_dict: Dict[str, np.ndarray], template) -> Any:
    """Build a flax param tree from a torch state_dict.

    ``template`` is a params pytree from ``model.init`` used to validate
    coverage and shapes. Raises ValueError listing any mismatch.
    """
    import jax

    filled: Dict[Tuple[str, ...], np.ndarray] = {}
    errors = []
    for key, value in state_dict.items():
        try:
            path, kind = _flax_path_for(key)
        except KeyError as exc:
            errors.append(str(exc))
            continue
        filled[path] = _transform(value, kind)

    params = jax.tree_util.tree_map(lambda x: x, template)  # deep copy structure
    tree = params["params"] if "params" in params else params
    # Unfreeze into plain dicts for assignment.
    import flax

    tree = flax.core.unfreeze(tree) if hasattr(flax.core, "unfreeze") else tree

    def walk(node, prefix):
        """Yield (path, leaf_shape) for every array leaf in the template."""
        for name, child in node.items():
            path = prefix + (name,)
            if isinstance(child, dict):
                yield from walk(child, path)
            else:
                yield path, child

    template_leaves = dict(walk(tree, ()))
    missing = sorted(set(template_leaves) - set(filled))
    extra = sorted(set(filled) - set(template_leaves))
    if missing or extra:
        errors.append(
            f"param-tree mismatch: missing={['/'.join(p) for p in missing]} "
            f"extra={['/'.join(p) for p in extra]}"
        )
    if errors:
        raise ValueError("torch checkpoint import failed:\n  " + "\n  ".join(errors))

    for path, value in filled.items():
        want = template_leaves[path].shape
        if tuple(value.shape) != tuple(want):
            errors.append(f"{'/'.join(path)}: shape {value.shape} != expected {want}")
    if errors:
        raise ValueError("torch checkpoint import failed:\n  " + "\n  ".join(errors))

    for path, value in filled.items():
        node = tree
        for name in path[:-1]:
            node = node[name]
        node[path[-1]] = value.astype(np.float32)

    return {"params": tree} if "params" in params else tree


def load_torch_checkpoint_params(ckpt_path, model, input_shape) -> Any:
    """Load reference ``best.ckpt`` weights for a built flax ``model``.

    ``input_shape`` is the (H, W, C) the model expects; only used to
    initialize a template tree for structure/shape validation.
    """
    import jax
    import jax.numpy as jnp

    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1,) + tuple(input_shape)))
    )
    template = jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype), template)
    state = load_torch_state_dict(ckpt_path)
    return torch_state_to_flax(state, template)
