"""Texture pool sampling: trilinear + software anisotropic filtering."""

import numpy as np
import jax.numpy as jnp

from gpu_raytracer_tpu.assets.texture import generate_mips
from gpu_raytracer_tpu.ops.textures import (
    pack_texture_pool,
    sample_aniso_grad,
    sample_bilinear_lod,
)


def _bands_texture(n=64):
    """Horizontal bands: white for v < 0.5, black after (varies along v)."""
    img = np.zeros((n, n, 3), np.uint8)
    img[: n // 2] = 255
    return img


def _pool():
    return pack_texture_pool([generate_mips(_bands_texture(), None)])


def test_aniso_tiny_footprint_matches_bilinear():
    tex = _pool()
    tid = jnp.zeros(4, jnp.int32)
    u = jnp.asarray([0.2, 0.6, 0.4, 0.8], jnp.float32)
    v = jnp.asarray([0.2, 0.2, 0.7, 0.7], jnp.float32)
    g_tiny = jnp.full((4, 2), 1e-6, jnp.float32)
    a = sample_aniso_grad(tex, tid, u, v, g_tiny, g_tiny)
    b = sample_bilinear_lod(tex, tid, u, v, jnp.zeros(4, jnp.float32))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_aniso_preserves_detail_across_major_axis():
    """Footprint long along u, thin along v, on horizontal bands: the aniso
    taps march along u (constant band) and stay sharp, while an isotropic
    lookup at the major-axis lod blurs toward gray."""
    tex = _pool()
    tid = jnp.zeros(1, jnp.int32)
    u = jnp.asarray([0.5], jnp.float32)
    v = jnp.asarray([0.45], jnp.float32)  # white band, near the edge
    g1 = jnp.asarray([[0.4, 0.0]], jnp.float32)   # 25.6 texels along u
    g2 = jnp.asarray([[0.0, 1.0 / 64]], jnp.float32)  # 1 texel along v

    aniso = float(np.asarray(sample_aniso_grad(tex, tid, u, v, g1, g2))[0, 0])
    iso_lod = jnp.log2(jnp.asarray([0.4 * 64], jnp.float32))
    iso = float(np.asarray(sample_bilinear_lod(tex, tid, u, v, iso_lod))[0, 0])
    assert aniso > 0.9, aniso          # still firmly in the white band
    assert iso < aniso - 0.1, (iso, aniso)  # iso footprint bleeds the bands


def test_aniso_wraps_across_border():
    tex = _pool()
    tid = jnp.zeros(1, jnp.int32)
    # Taps span u in [0.9, 1.1]: must wrap, not clamp or crash.
    out = sample_aniso_grad(
        tex, tid, jnp.asarray([1.0], jnp.float32),
        jnp.asarray([0.25], jnp.float32),
        jnp.asarray([[0.2, 0.0]], jnp.float32),
        jnp.asarray([[0.0, 0.01]], jnp.float32))
    assert np.isfinite(np.asarray(out)).all()
    assert float(out[0, 0]) > 0.9  # white band everywhere at v=0.25


def test_dds_bc1_fallback_decode(tmp_path):
    """BC1 DDS decode via the numpy fallback (reference: TextureLoader.cpp
    load_dds): a 4x4 one-block file with c0=red, c1=blue and per-texel
    palette indices [0,1,2,3] repeating."""
    import numpy as np

    from gpu_raytracer_tpu.assets.texture import decode_dds

    hdr = np.zeros(128, np.uint8)
    hdr[0:4] = np.frombuffer(b"DDS ", np.uint8)
    dw = hdr[4:128].view(np.uint32)
    dw[0] = 124
    dw[2] = 4   # height
    dw[3] = 4   # width
    hdr[84:88] = np.frombuffer(b"DXT1", np.uint8)
    c0 = 0xF800  # red in RGB565
    c1 = 0x001F  # blue
    # index bits: texel i uses palette (i % 4): 0b11100100 per row byte
    block = np.array([c0 & 0xFF, c0 >> 8, c1 & 0xFF, c1 >> 8,
                      0b11100100, 0b11100100, 0b11100100, 0b11100100],
                     np.uint8)
    f = tmp_path / "test.dds"
    np.concatenate([hdr, block]).tofile(str(f))

    img = decode_dds(str(f))
    assert img.shape == (4, 4, 3)
    np.testing.assert_array_equal(img[0, 0], [255, 0, 0])     # c0
    np.testing.assert_array_equal(img[0, 1], [0, 0, 255])     # c1
    # c0 > c1 -> 4-color mode: 2/3 red + 1/3 blue then 1/3 red + 2/3 blue
    np.testing.assert_allclose(img[0, 2], [170, 0, 85], atol=1)
    np.testing.assert_allclose(img[0, 3], [85, 0, 170], atol=1)
    # every row identical
    np.testing.assert_array_equal(img[1:], np.broadcast_to(img[0], (3, 4, 3)))


def test_arith_addressing_matches_descriptor_sampler():
    """sample_bilinear_lod_arith must return the same texels as the
    descriptor-gather sampler for every (texture, mip, uv), including
    non-square and non-pow2 dims (the padded pow2-slot layout)."""
    from gpu_raytracer_tpu.ops.textures import sample_bilinear_lod_arith

    rng = np.random.default_rng(7)
    chains = []
    for h, w in [(64, 64), (48, 96), (7, 33), (1, 1), (128, 32)]:
        img = rng.integers(0, 256, (h, w, 3), np.uint8)
        chains.append(generate_mips(img, None))
    tex = pack_texture_pool(chains)
    base_off = np.asarray(tex["base_off_np"])
    w0 = np.asarray(tex["w0_np"], np.float32)
    h0 = np.asarray(tex["h0_np"], np.float32)
    max_mip = np.asarray(tex["num_mips_np"], np.float32) - 1.0

    R = 256
    tid = rng.integers(0, len(chains), R).astype(np.int32)
    u = rng.random(R, np.float32) * 2.2 - 0.6   # exercises wrapping
    v = rng.random(R, np.float32) * 2.2 - 0.6
    lod = (rng.random(R, np.float32) * 12.0).astype(np.float32)

    for nearest in (False, True):
        a = sample_bilinear_lod(tex, jnp.asarray(tid), jnp.asarray(u),
                                jnp.asarray(v), jnp.asarray(lod),
                                nearest_mip=nearest)
        b = sample_bilinear_lod_arith(
            tex, jnp.asarray(base_off[tid]), jnp.asarray(w0[tid]),
            jnp.asarray(h0[tid]), jnp.asarray(u), jnp.asarray(v),
            jnp.asarray(lod), nearest_mip=nearest,
            max_mip=jnp.asarray(max_mip[tid]))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, err_msg=f"nearest={nearest}")
