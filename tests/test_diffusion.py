"""Diffusion stack: schedulers, attention processors, tiny UNet/ControlNet/VAE,
weight conversion, and the end-to-end edit pipeline with random weights."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussctrl_exp_tpu.diffusion.attention import (
    _sdpa,
    default_processor,
    make_cross_view_processor,
)
from gaussctrl_exp_tpu.diffusion.schedulers import (
    DDIMInverseScheduler,
    DDIMScheduler,
    SchedulerConfig,
)
from gaussctrl_exp_tpu.diffusion.sd_pipeline import SDControlNetPipeline, init_random_models

TINY = dict(block_out=(32, 64), vae_block_out=(32, 32, 32, 32), heads=2, cross_dim=32,
            layers_per_block=1)


@pytest.fixture(scope="module")
def tiny_models():
    return init_random_models(jax.random.PRNGKey(0), latent=8, **TINY)


class TestSchedulers:
    def test_timesteps_sd_spacing(self):
        s = DDIMScheduler()
        t = s.set_timesteps(20)
        assert t[0] == 951 and t[-1] == 1 and len(t) == 20  # leading spacing + offset 1
        si = DDIMInverseScheduler()
        ti = si.set_timesteps(20)
        assert ti[0] == 1 and ti[-1] == 951
        np.testing.assert_array_equal(ti, t[::-1])

    def test_alphas_scaled_linear(self):
        s = DDIMScheduler()
        a = np.asarray(s.alphas_cumprod)
        assert a.shape == (1000,)
        assert 0.998 < a[0] < 1.0 and a[-1] < 0.01
        assert np.all(np.diff(a) < 0)

    def test_invert_then_denoise_roundtrip_exact_for_linear_model(self):
        """With eps = const (a 'model' both schedulers agree on), inversion
        followed by denoising must return the original latent exactly."""
        cfg = SchedulerConfig()
        fwd = DDIMScheduler(cfg)
        inv = DDIMInverseScheduler(cfg)
        steps = 10
        t_fwd = fwd.set_timesteps(steps)
        t_inv = inv.set_timesteps(steps)
        rng = np.random.default_rng(0)
        x0 = jnp.asarray(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
        eps = jnp.asarray(rng.normal(size=(1, 4, 4, 4)).astype(np.float32)) * 0.1

        x = x0
        for t in t_inv:
            x = inv.step(eps, int(t), x)
        for t in t_fwd:
            x = fwd.step(eps, int(t), x)
        # with set_alpha_to_one=False (the SD config), the final denoise step
        # targets alphas_cumprod[0], not 1 — same boundary as diffusers
        a0 = np.asarray(fwd.alphas_cumprod)[0]
        expect = np.sqrt(a0) * np.asarray(x0) + np.sqrt(1 - a0) * np.asarray(eps)
        np.testing.assert_allclose(np.asarray(x), expect, atol=2e-4)

    def test_add_noise_snr(self):
        s = DDIMScheduler()
        x = jnp.ones((2, 2))
        n = jnp.ones((2, 2))
        out = s.add_noise(x, n, 0)
        a0 = float(s.alphas_cumprod[0])
        np.testing.assert_allclose(out, np.sqrt(a0) + np.sqrt(1 - a0), rtol=1e-6)


class TestCrossViewProcessor:
    def _qkv(self, B=8, H=2, S=6, D=4, seed=0):
        rng = np.random.default_rng(seed)
        mk = lambda: jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
        return mk(), mk(), mk()

    def test_cross_attention_untouched(self):
        q, k, v = self._qkv()
        proc = make_cross_view_processor(0.6, 4)
        np.testing.assert_allclose(proc(q, k, v, True), default_processor(q, k, v, True))

    def test_self_attention_mixing_semantics(self):
        """Matches a direct reimplementation of utils.py:94-117: per CFG group,
        every view attends to refs 0..3; output = 0.6·self + 0.4·mean(ref)."""
        q, k, v = self._qkv(B=8)  # 2 CFG groups × 4 views
        proc = make_cross_view_processor(0.6, 4, unet_chunk_size=2)
        out = np.asarray(proc(q, k, v, False))

        qn, kn, vn = map(np.asarray, (q, k, v))
        B, H, S, D = qn.shape
        V = B // 2
        self_out = np.asarray(_sdpa(q, k, v))
        ref_outs = []
        for r in range(4):
            o = np.zeros_like(self_out)
            for b in range(B):
                group = b // V
                bref = group * V + r
                o[b] = np.asarray(
                    _sdpa(q[b : b + 1], k[bref : bref + 1], v[bref : bref + 1])
                )[0]
            ref_outs.append(o)
        expect = 0.6 * self_out + 0.4 * np.mean(ref_outs, axis=0)
        np.testing.assert_allclose(out, expect, atol=1e-5)

    def test_coeff_one_equals_default(self):
        q, k, v = self._qkv()
        proc = make_cross_view_processor(1.0, 4)
        np.testing.assert_allclose(
            proc(q, k, v, False), default_processor(q, k, v, False), atol=1e-6
        )


class TestTinyModels:
    def test_unet_shapes(self, tiny_models):
        m = tiny_models
        out = m.unet.apply(
            {"params": m.unet_params},
            jnp.zeros((2, 8, 8, 4)), jnp.zeros((2,), jnp.int32), jnp.zeros((2, 77, 32)),
        )
        assert out.shape == (2, 8, 8, 4)

    def test_controlnet_residual_shapes_and_zero_init(self, tiny_models):
        m = tiny_models
        down, mid = m.controlnet.apply(
            {"params": m.controlnet_params},
            jnp.ones((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32), jnp.ones((1, 77, 32)),
            jnp.ones((1, 64, 64, 3)),
        )
        # zero-initialized projections ⇒ residuals are exactly zero at init
        for r in down:
            assert float(jnp.abs(r).max()) == 0.0
        assert float(jnp.abs(mid).max()) == 0.0
        # unet with zero residuals == unet without
        a = m.unet.apply({"params": m.unet_params}, jnp.ones((1, 8, 8, 4)),
                         jnp.zeros((1,), jnp.int32), jnp.ones((1, 77, 32)))
        b = m.unet.apply({"params": m.unet_params}, jnp.ones((1, 8, 8, 4)),
                         jnp.zeros((1,), jnp.int32), jnp.ones((1, 77, 32)),
                         controlnet_residuals=(down, mid))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_vae_roundtrip_shapes(self, tiny_models):
        m = tiny_models
        pipe = SDControlNetPipeline(m)
        img = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
        lat = pipe.image_to_latent(img)
        assert lat.shape == (1, 8, 8, 4)
        rec = pipe.latent_to_image(lat)
        assert rec.shape == (1, 64, 64, 3)
        assert float(rec.min()) >= 0.0 and float(rec.max()) <= 1.0

    def test_generate_runs_with_cross_view_processor(self, tiny_models):
        pipe = SDControlNetPipeline(tiny_models)
        B = 6  # 4 refs + 2 chunk views
        lat = jnp.asarray(np.random.default_rng(1).normal(size=(B, 8, 8, 4)).astype(np.float32))
        ctx_c = jnp.zeros((B, 77, 32))
        ctx_u = jnp.zeros((B, 77, 32))
        hint = jnp.zeros((B, 64, 64, 3))
        proc = make_cross_view_processor(0.6, 4)
        out = pipe.generate(lat, ctx_c, ctx_u, hint, guidance_scale=5.0, num_steps=3,
                            processor=proc)
        assert out.shape == lat.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_invert_runs(self, tiny_models):
        pipe = SDControlNetPipeline(tiny_models)
        lat = jnp.asarray(np.random.default_rng(2).normal(size=(2, 8, 8, 4)).astype(np.float32))
        out = pipe.invert(lat, jnp.zeros((2, 77, 32)), jnp.zeros((2, 64, 64, 3)), num_steps=3)
        assert out.shape == lat.shape and np.isfinite(np.asarray(out)).all()


class TestConvert:
    def test_unet_key_translation(self):
        from gaussctrl_exp_tpu.diffusion.convert import translate_unet_key

        cases = {
            "conv_in.weight": "conv_in.weight",
            "time_embedding.linear_1.weight": "time_embedding_linear_1.weight",
            "down_blocks.0.resnets.1.conv1.weight": "down_0_resnet_1.conv1.weight",
            "down_blocks.2.attentions.1.transformer_blocks.0.attn1.to_q.weight":
                "down_2_attn_1.transformer_blocks_0.attn1.to_q.weight",
            "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight":
                "down_0_attn_0.transformer_blocks_0.ff.proj.weight",
            "down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_out.0.bias":
                "down_0_attn_0.transformer_blocks_0.attn2.to_out_0.bias",
            "mid_block.attentions.0.proj_in.weight": "mid_attn_0.proj_in.weight",
            "up_blocks.3.upsamplers.0.conv.weight": None,  # up block 3 has no upsampler… actually translate works; see below
            "controlnet_down_blocks.5.weight": "controlnet_down_blocks_5.weight",
        }
        for src, want in cases.items():
            if want is None:
                continue
            assert translate_unet_key(src) == want, src

    def test_convert_small_state_dict_matches_init_structure(self):
        """A synthetic torch-layout state dict converts into a tree whose
        shapes match a tiny UNet's random init (proving naming + transposes)."""
        from gaussctrl_exp_tpu.diffusion.convert import convert_state_dict, translate_unet_key

        tiny = init_random_models(jax.random.PRNGKey(1), latent=8, **TINY)
        # build a torch-style flat dict from the flax tree by inverting rules
        flat = {}

        def walk(node, path):
            for k, v in node.items():
                if isinstance(v, dict):
                    walk(v, path + [k])
                else:
                    flat[tuple(path + [k])] = np.asarray(v)

        walk(jax.device_get(tiny.unet_params), [])
        torch_sd = {}
        for path, v in flat.items():
            mod = list(path[:-1])
            pn = path[-1]
            name = ".".join(mod)
            # invert our naming to diffusers naming
            name = name.replace("time_embedding_linear_1", "time_embedding.linear_1")
            name = name.replace("time_embedding_linear_2", "time_embedding.linear_2")
            import re as _re

            name = _re.sub(r"down_(\d+)_resnet_(\d+)", r"down_blocks.\1.resnets.\2", name)
            name = _re.sub(r"down_(\d+)_attn_(\d+)", r"down_blocks.\1.attentions.\2", name)
            name = _re.sub(r"down_(\d+)_downsample", r"down_blocks.\1.downsamplers.0", name)
            name = _re.sub(r"up_(\d+)_resnet_(\d+)", r"up_blocks.\1.resnets.\2", name)
            name = _re.sub(r"up_(\d+)_attn_(\d+)", r"up_blocks.\1.attentions.\2", name)
            name = _re.sub(r"up_(\d+)_upsample", r"up_blocks.\1.upsamplers.0", name)
            name = _re.sub(r"mid_resnet_(\d+)", r"mid_block.resnets.\1", name)
            name = name.replace("mid_attn_0", "mid_block.attentions.0")
            name = _re.sub(r"transformer_blocks_(\d+)", r"transformer_blocks.\1", name)
            name = name.replace(".to_out_0", ".to_out.0")
            name = name.replace(".ff.proj", ".ff.net.0.proj")
            name = name.replace(".ff.out", ".ff.net.2")
            if pn == "kernel":
                tv = v.transpose(3, 2, 0, 1) if v.ndim == 4 else v.transpose(1, 0)
                torch_sd[name + ".weight"] = tv
            elif pn == "scale":
                torch_sd[name + ".weight"] = v
            else:
                torch_sd[name + ".bias"] = v

        tree = convert_state_dict(torch_sd, translate_unet_key)

        def compare(a, b, path=""):
            assert set(a) == set(b), f"{path}: {set(a) ^ set(b)}"
            for k in a:
                if isinstance(a[k], dict):
                    compare(a[k], b[k], path + "/" + k)
                else:
                    np.testing.assert_allclose(a[k], np.asarray(b[k]), err_msg=path + "/" + k)

        compare(tree, jax.device_get(tiny.unet_params))


@pytest.mark.slow
class TestEditPipeline:
    def test_reference_view_selection_deterministic(self):
        from gaussctrl_exp_tpu.diffusion.pipeline import select_reference_views

        a = select_reference_views(40, 4)
        b = select_reference_views(40, 4)
        assert a == b and len(a) == 4
        # one per quarter (anchors at 0, 10, 20, 30)
        for i, idx in enumerate(a):
            assert 10 * i <= idx <= 10 * (i + 1)

    def test_depth_to_disparity(self):
        from gaussctrl_exp_tpu.diffusion.pipeline import depth_to_disparity

        d = np.array([[1.0, 2.0], [4.0, 1000.0]])
        disp = depth_to_disparity(d)
        assert disp.shape == (2, 2, 3)
        np.testing.assert_allclose(disp[0, 0], 1.0, rtol=1e-4)  # nearest → 1 after norm
        assert disp[1, 1, 0] < 0.01

    @pytest.mark.parametrize("proc", ["attn_align", "triplane", "correspondence"])
    def test_full_edit_loop_tiny(self, tiny_models, proc):
        """render_reverse + edit_images end-to-end with random weights on a
        tiny synthetic scene, once per attention-processor choice (AttnAlign
        is the paper path; triplane/correspondence surface the reference
        fork's experimental processors, gc_pipeline.py:329-398): runs, writes
        back edited images of right shape."""
        from gaussctrl_exp_tpu.cameras import look_at, make_camera
        from gaussctrl_exp_tpu.diffusion.pipeline import EditConfig, GaussCtrlEditPipeline
        from gaussctrl_exp_tpu.diffusion.sd_pipeline import attach_text_encoder
        from gaussctrl_exp_tpu.models.gaussians import init_random
        from gaussctrl_exp_tpu.models.splat_model import SplatModelConfig
        from gaussctrl_exp_tpu.ops.renderer import RenderConfig

        V, H, W = 6, 64, 64

        class DM:
            def __init__(self):
                self.images = np.zeros((V, H, W, 3), np.float32)
                self.width, self.height = W, H
                self.writes = []

            def __len__(self):
                return V

            def camera(self, i):
                ang = 0.3 * i
                eye = np.array([4 * np.sin(ang), -4 * np.cos(ang), 1.0])
                return make_camera(look_at(eye, np.zeros(3)), 70.0, 70.0, W / 2, H / 2, W, H)

            def write_back(self, i, img):
                self.writes.append(i)
                self.images[i] = img

        models = attach_text_encoder(tiny_models)
        # tiny text encoder has hidden 768? we need ctx dim == cross_dim 32 →
        # project: easiest is a wrapper tokenizer/encoder; patch with a stub
        class StubTE:
            def __call__(self, input_ids, params=None):
                import types

                B = np.asarray(input_ids).shape[0]
                rng = np.random.default_rng(int(np.asarray(input_ids).sum()) % 1000)
                return types.SimpleNamespace(
                    last_hidden_state=jnp.asarray(rng.normal(size=(B, 77, 32)).astype(np.float32))
                )

        models.text_encoder = StubTE()
        models.text_params = None

        cfg = EditConfig(edit_prompt="a bear statue", reverse_prompt="a bear",
                         num_inference_steps=2, chunk_size=2, guidance_scale=5.0,
                         attn_processor=proc, latent_size=8)
        pipe = GaussCtrlEditPipeline(cfg, models=models)

        gs = init_random(64, capacity=64, sh_degree=1, seed=0)
        model_cfg = SplatModelConfig(
            sh_degree=1, background_color="white",
            render=RenderConfig(impl="jnp", isect_capacity=1 << 12, max_per_tile=128),
        )
        dm = DM()
        pipe.render_reverse(gs, dm, model_cfg)
        assert len(pipe.z0) == V
        assert pipe.z0[0].shape == (8, 8, 4)
        assert pipe.disparity[0].shape == (H, W, 3)

        pipe.edit_images(dm)
        # every non-ref view + the 4 refs written once
        assert sorted(set(dm.writes)) == sorted(set(range(V)))
        assert dm.images.min() >= 0.0 and dm.images.max() <= 1.0

    def test_sidecar_roundtrip(self, tiny_models, tmp_path):
        """Second render_reverse on the same scene resumes every view from
        sidecars — ZERO inversions (gc_dataset.py:129-158 round-trip)."""
        from gaussctrl_exp_tpu.cameras import look_at, make_camera
        from gaussctrl_exp_tpu.diffusion.pipeline import EditConfig, GaussCtrlEditPipeline
        from gaussctrl_exp_tpu.models.gaussians import init_random
        from gaussctrl_exp_tpu.models.splat_model import SplatModelConfig
        from gaussctrl_exp_tpu.ops.renderer import RenderConfig

        V, H, W = 3, 64, 64

        class DM:
            view_indices = [0, 2, 4]  # exercise global-frame numbering

            def __len__(self):
                return V

            def camera(self, i):
                ang = 0.3 * i
                eye = np.array([4 * np.sin(ang), -4 * np.cos(ang), 1.0])
                return make_camera(look_at(eye, np.zeros(3)), 70.0, 70.0, W / 2, H / 2, W, H)

        class StubTE:
            def __call__(self, input_ids, params=None):
                import types

                B = np.asarray(input_ids).shape[0]
                return types.SimpleNamespace(
                    last_hidden_state=jnp.zeros((B, 77, 32), jnp.float32)
                )

        def make_pipe():
            m = tiny_models
            m.text_encoder, m.text_params = StubTE(), None
            cfg = EditConfig(edit_prompt="x", reverse_prompt="y",
                             num_inference_steps=2, sidecar_dir=str(tmp_path))
            return GaussCtrlEditPipeline(cfg, models=m)

        gs = init_random(64, capacity=64, sh_degree=1, seed=0)
        model_cfg = SplatModelConfig(
            sh_degree=1, background_color="white",
            render=RenderConfig(impl="jnp", isect_capacity=1 << 12, max_per_tile=128),
        )
        p1 = make_pipe()
        p1.render_reverse(gs, DM(), model_cfg)
        assert p1.n_inversions == V and p1.n_resumed == 0
        assert (tmp_path / "z_0" / "frame_00003.npy").exists()  # global idx 2
        assert (tmp_path / "depth_npy" / "frame_00001.npy").exists()

        p2 = make_pipe()
        p2.render_reverse(gs, DM(), model_cfg)
        assert p2.n_inversions == 0 and p2.n_resumed == V
        for i in range(V):
            np.testing.assert_allclose(p2.z0[i], p1.z0[i])
            np.testing.assert_allclose(p2.disparity[i], p1.disparity[i], atol=1e-6)
            np.testing.assert_allclose(p2.unedited[i], p1.unedited[i])

        # force_recompute overrides resume
        p3 = make_pipe()
        p3.render_reverse(gs, DM(), model_cfg, force_recompute=True)
        assert p3.n_inversions == V and p3.n_resumed == 0


@pytest.mark.slow
class TestBf16Parity:
    """bf16 is the deployment compute dtype (load_sd_models default — the
    TPU-native counterpart of the reference's fp16, ad_pipeline.py:101-108).
    The bf16 UNet eps must track the f32 eps closely (fp32 softmax guards
    keep attention well-conditioned; remaining error is bf16 rounding)."""

    def test_unet_bf16_matches_f32(self):
        f32 = init_random_models(jax.random.PRNGKey(3), latent=8, **TINY)
        from gaussctrl_exp_tpu.diffusion.unet import UNet2DCondition

        unet_bf16 = UNet2DCondition(
            block_out=TINY["block_out"], heads=TINY["heads"],
            cross_dim=TINY["cross_dim"], layers_per_block=TINY["layers_per_block"],
            temb_dim=TINY["block_out"][-1], dtype=jnp.bfloat16,
        )
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
        t = jnp.asarray([10, 500], jnp.int32)
        ctx = jnp.asarray(rng.normal(size=(2, 77, TINY["cross_dim"])).astype(np.float32))
        e32 = f32.unet.apply({"params": f32.unet_params}, x, t, ctx)
        e16 = unet_bf16.apply({"params": f32.unet_params}, x, t, ctx)
        assert e16.dtype == jnp.bfloat16
        scale = float(jnp.std(e32)) + 1e-8
        err = float(jnp.max(jnp.abs(e16.astype(jnp.float32) - e32))) / scale
        assert err < 0.15, f"relative bf16 deviation {err}"

    def test_vae_attention_softmax_f32_guard(self):
        """The VAE mid-block attention must not overflow under bf16: logits
        of magnitude ~90 saturate bf16 exp but are exact in the fp32 guard."""
        from gaussctrl_exp_tpu.diffusion.vae import VaeAttention

        blk = VaeAttention(dtype=jnp.bfloat16)
        x = jnp.full((1, 4, 4, 32), 3.0, jnp.bfloat16)
        params = blk.init(jax.random.PRNGKey(0), x)["params"]
        out = blk.apply({"params": params}, x)
        assert bool(jnp.isfinite(out.astype(jnp.float32)).all())

    def test_bf16_invert_generate_loop_runs(self):
        """The full denoise loops must run with a bf16 model: scheduler steps
        accumulate in f32, so the scan carry must stay f32 even when the
        VAE/UNet emit bf16 (caught on hardware by scripts/edit_smoke_tpu.py)."""
        m = init_random_models(jax.random.PRNGKey(5), latent=8, dtype=jnp.bfloat16, **TINY)
        pipe = SDControlNetPipeline(m)
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
        hint = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
        ctx = jnp.asarray(rng.normal(size=(2, 77, TINY["cross_dim"])).astype(np.float32))
        mp = pipe.params
        lat = jax.jit(pipe.image_to_latent)(imgs, params=mp)
        assert lat.dtype == jnp.bfloat16  # the model really is bf16
        z0 = jax.jit(lambda p, l, h: pipe.invert(l, ctx, h, 2, 1.0, params=p))(mp, lat, hint)
        out = jax.jit(
            lambda p, z, h: pipe.generate(z, ctx, ctx * 0.1, h, 5.0, 2, 1.0, params=p)
        )(mp, z0, hint)
        img = jax.jit(lambda p, l: pipe.latent_to_image(l, params=p))(mp, out)
        assert bool(jnp.isfinite(img.astype(jnp.float32)).all())
