"""SAM (Flax) + LangSAM orchestrator + torch-key converter mapping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussctrl_exp_tpu.segmentation.convert import (
    convert_sam_state_dict,
    flax_to_torch_keys,
    translate_sam_key,
)
from gaussctrl_exp_tpu.segmentation.lang_sam import FullImageBox, LangSAM, PrecomputedBoxes
from gaussctrl_exp_tpu.segmentation.sam import SAM, SAMConfig

TINY = SAMConfig(img_size=64, patch_size=8, encoder_dim=32, encoder_depth=2,
                 encoder_heads=2, encoder_global_attn=(1,), window_size=4,
                 prompt_dim=16, decoder_heads=2)


@pytest.fixture(scope="module")
def tiny_sam():
    m = SAM(TINY)
    img = jnp.zeros((1, 64, 64, 3))
    boxes = jnp.asarray([[8.0, 8.0, 40.0, 48.0]])
    params = m.init(jax.random.PRNGKey(0), img, boxes)
    return m, params


def test_sam_forward_shapes(tiny_sam):
    m, params = tiny_sam
    img = jnp.zeros((1, 64, 64, 3))
    boxes = jnp.asarray([[8.0, 8.0, 40.0, 48.0], [0.0, 0.0, 64.0, 64.0]])
    emb = m.apply(params, img, method=SAM.encode_image)
    assert emb.shape == (1, 8, 8, 16)
    emb2 = jnp.broadcast_to(emb, (2, 8, 8, 16))
    masks, iou = m.apply(params, emb2, boxes, method=SAM.predict_boxes)
    assert masks.shape == (2, 1, 32, 32)  # low-res = 4×embed_hw
    assert iou.shape == (2, 1)
    multi, iou3 = m.apply(params, emb2, boxes, True, method=SAM.predict_boxes)
    assert multi.shape == (2, 3, 32, 32) and iou3.shape == (2, 3)


def test_sam_box_sensitivity(tiny_sam):
    """Different boxes produce different masks (prompts actually condition)."""
    m, params = tiny_sam
    img = jnp.zeros((1, 64, 64, 3))
    m1, _ = m.apply(params, img, jnp.asarray([[4.0, 4.0, 20.0, 20.0]]))
    m2, _ = m.apply(params, img, jnp.asarray([[40.0, 40.0, 60.0, 60.0]]))
    assert not np.allclose(np.asarray(m1), np.asarray(m2))


def test_converter_roundtrip(tiny_sam):
    """flax → torch-style flat dict → flax reproduces the tree exactly,
    pinning the key-mapping contract of convert_sam_state_dict."""
    _, params = tiny_sam
    flat = flax_to_torch_keys(params)
    assert all("/" not in k for k in flat)
    back = convert_sam_state_dict(flat)

    ref = jax.tree_util.tree_leaves_with_path(params)
    got = jax.tree_util.tree_leaves_with_path(back)
    assert len(ref) == len(got)
    ref_map = {tuple(str(k) for k in p): v for p, v in ref}
    got_map = {tuple(str(k) for k in p): v for p, v in got}
    assert ref_map.keys() == got_map.keys()
    for k in ref_map:
        np.testing.assert_array_equal(np.asarray(ref_map[k]), np.asarray(got_map[k]), err_msg=str(k))


def test_translate_canonical_torch_keys():
    """Spot-check real segment_anything checkpoint key names translate."""
    cases = {
        "image_encoder.blocks.31.attn.qkv.weight":
            ("image_encoder", "blocks.31", "attn", "qkv", "kernel"),
        "image_encoder.blocks.0.mlp.lin1.bias":
            ("image_encoder", "blocks.0", "mlp.lin1", "bias"),
        "image_encoder.neck.2.weight": ("image_encoder", "neck.2", "kernel"),
        "image_encoder.neck.3.bias": ("image_encoder", "neck.3", "bias"),
        "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix":
            ("prompt_encoder", "pe_layer.positional_encoding_gaussian_matrix"),
        "prompt_encoder.point_embeddings.2.weight":
            ("prompt_encoder", "point_embeddings.2.weight"),
        "mask_decoder.transformer.layers.1.cross_attn_image_to_token.q_proj.weight":
            ("mask_decoder", "transformer.layers.1", "cross_attn_image_to_token",
             "q_proj", "kernel"),
        "mask_decoder.transformer.norm_final_attn.weight":
            ("mask_decoder", "transformer.norm_final_attn", "scale"),
        "mask_decoder.output_upscaling.0.weight":
            ("mask_decoder", "output_upscaling.0.weight"),
        "mask_decoder.output_hypernetworks_mlps.3.layers.2.weight":
            ("mask_decoder", "output_hypernetworks_mlps.3", "layers.2", "kernel"),
        "mask_decoder.iou_prediction_head.layers.0.bias":
            ("mask_decoder", "iou_prediction_head", "layers.0", "bias"),
    }
    for key, path in cases.items():
        tr = translate_sam_key(key, (4, 4) if key.endswith("weight") else (4,))
        assert tr is not None, key
        assert tr[0] == path, (key, tr[0])
    # buffers and unimplemented mask-input path are skipped, not errors
    assert translate_sam_key("pixel_mean", (3,)) is None
    assert translate_sam_key("prompt_encoder.mask_downscaling.0.weight", (4, 1, 2, 2)) is None


def test_lang_sam_predict_fullframe(tiny_sam):
    """predict() returns the reference-shaped tuple with the fallback box
    provider; mask logits threshold into a boolean per-box mask stack."""
    _, params = tiny_sam
    ls = LangSAM(params, TINY, box_provider=FullImageBox())
    img = (np.random.default_rng(0).uniform(0, 255, (48, 56, 3))).astype(np.uint8)
    masks, boxes, phrases, logits = ls.predict(img, "a bear statue")
    assert masks.shape == (1, 48, 56) and masks.dtype == bool
    assert boxes.shape == (1, 4) and phrases == ["a bear statue"]


def test_lang_sam_precomputed_boxes(tiny_sam, tmp_path):
    _, params = tiny_sam
    import json

    (tmp_path / "boxes.json").write_text(json.dumps(
        {"frame_00001.png": [[4, 4, 30, 30], [10, 10, 40, 44]]}))
    provider = PrecomputedBoxes(tmp_path / "boxes.json").bind("frame_00001.png")
    ls = LangSAM(params, TINY, box_provider=provider)
    img = np.zeros((48, 48, 3), np.uint8)
    masks, boxes, phrases, logits = ls.predict(img, "object")
    assert masks.shape == (2, 48, 48)
    assert boxes.shape == (2, 4)
