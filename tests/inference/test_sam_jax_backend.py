"""JaxSamBackend (accelerator-native SAM) backend-contract tests.

Model numerics are pinned against ``transformers.SamModel`` in
``tests/models/test_sam_jax.py``; here we exercise the backend protocol:
registration, prompt batching/padding into power-of-two buckets, encode-once
decode-per-prompt-set execution, and mask/score output contracts
(reference sam/backends.py:314 — the HF wrapper this replaces on TPU).
"""

from __future__ import annotations

import numpy as np
import pytest
pytestmark = pytest.mark.slow  # integration tier: real training loops / model builds / subprocesses


torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sleap_nn_tpu.inference.sam import MASK_BACKENDS
from sleap_nn_tpu.inference.sam.backends import JaxSamBackend
from sleap_nn_tpu.inference.sam.prompts import SamPrompt


def _tiny_backend(**kwargs) -> JaxSamBackend:
    from transformers import SamConfig
    from transformers.models.sam.modeling_sam import SamModel

    from sleap_nn_tpu.models.sam_jax import SamArch, convert_sam_state_dict

    config = SamConfig(
        vision_config=dict(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            image_size=32, patch_size=8, window_size=2,
            global_attn_indexes=[1], mlp_dim=64, output_channels=16,
            num_pos_feats=8, attn_implementation="eager",
        ),
        prompt_encoder_config=dict(
            hidden_size=16, image_size=32, patch_size=8,
            image_embedding_size=4, mask_input_channels=8,
        ),
        mask_decoder_config=dict(
            hidden_size=16, num_hidden_layers=2, num_attention_heads=2,
            mlp_dim=32, iou_head_hidden_dim=16,
        ),
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = SamModel(config).eval()
    arch = SamArch.from_hf_config(config)
    params = convert_sam_state_dict(model.state_dict())
    return JaxSamBackend(params, arch, clahe=False, **kwargs)


def _prompt(points=None, box=None, h=24, w=20):
    reject = np.array([0.0, 0.0, w, h], np.float32)
    return SamPrompt(
        point_coords=None if points is None else np.asarray(points, np.float32),
        point_labels=None if points is None else np.ones(len(points), np.int32),
        box=None if box is None else np.asarray(box, np.float32),
        reject_box=reject,
        mode="pose" if points is not None else "box",
    )


def test_sam_jax_registered_and_routed(monkeypatch):
    from sleap_nn_tpu.inference import sam as sam_pkg

    assert "sam_jax" in MASK_BACKENDS
    seen = {}

    def fake_from_pretrained(cls, model_id="x", device="cpu", **kw):
        seen["model_id"] = model_id
        return "BACKEND"

    monkeypatch.setattr(JaxSamBackend, "from_pretrained",
                        classmethod(fake_from_pretrained))
    out = sam_pkg.get_mask_backend("sam_jax", sam_model_id="my/snapshot")
    assert out == "BACKEND" and seen["model_id"] == "my/snapshot"


def test_point_prompts_full_image_masks():
    backend = _tiny_backend()
    img = (np.random.default_rng(0).uniform(0, 255, (24, 20, 3))
           .astype(np.uint8))
    prompts = [_prompt(points=[[5.0, 6.0]]),
               _prompt(points=[[12.0, 18.0], [3.0, 3.0]]),
               _prompt(points=[[15.0, 10.0]])]
    masks, scores = backend.masks(img, prompts)
    assert len(masks) == 3 and len(scores) == 3
    for m in masks:
        assert m.shape == (24, 20) and m.dtype == bool
    assert all(isinstance(s, float) for s in scores)


def test_box_and_mixed_prompts():
    backend = _tiny_backend()
    img = (np.random.default_rng(1).uniform(0, 255, (20, 24, 3))
           .astype(np.uint8))
    prompts = [_prompt(box=[2.0, 2.0, 18.0, 16.0], h=20, w=24),
               _prompt(points=[[10.0, 10.0]], h=20, w=24)]
    masks, scores = backend.masks(img, prompts)
    assert len(masks) == 2
    assert masks[0].shape == (20, 24)


def test_empty_prompt_list():
    backend = _tiny_backend()
    img = np.zeros((16, 16, 3), np.uint8)
    masks, scores = backend.masks(img, [])
    assert masks == [] and scores == []


def test_decode_fn_bucketed_and_cached():
    backend = _tiny_backend()
    img = np.zeros((16, 16, 3), np.uint8)
    # 3 prompts with 1 point each -> bucket (4, 1, False)
    backend.masks(img, [_prompt(points=[[4.0, 4.0]], h=16, w=16)
                        for _ in range(3)])
    assert (4, 1, False) in backend._decode_cache
    n = len(backend._decode_cache)
    # 4 prompts reuses the same bucketed program — no new cache entry.
    backend.masks(img, [_prompt(points=[[4.0, 4.0]], h=16, w=16)
                        for _ in range(4)])
    assert len(backend._decode_cache) == n


def test_bucket_rounding():
    assert JaxSamBackend._bucket(1) == 1
    assert JaxSamBackend._bucket(3) == 4
    assert JaxSamBackend._bucket(4) == 4
    assert JaxSamBackend._bucket(9) == 16


def test_bf16_params_still_produce_masks():
    backend = _tiny_backend(use_bf16=True)
    img = (np.random.default_rng(2).uniform(0, 255, (16, 16, 3))
           .astype(np.uint8))
    masks, scores = backend.masks(img, [_prompt(points=[[8.0, 8.0]],
                                                h=16, w=16)])
    assert masks[0].shape == (16, 16)
