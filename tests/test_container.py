"""Container (RIFF/VP8X) metadata tests against the fixture corpus."""

import pytest

from webp_tpu.container.demux import WebPDecoder, ImageInfo


@pytest.mark.parametrize("name,w,h", [("1", 550, 368), ("2", 550, 404), ("3", 1280, 720), ("4", 1024, 772), ("5", 1024, 752)])
def test_gallery1_lossy_metadata(fixtures, name, w, h):
    data = (fixtures / "gallery1" / f"{name}.webp").read_bytes()
    d = WebPDecoder(data)
    assert d.dimensions() == (w, h)
    assert d.is_lossy
    assert not d.has_alpha
    assert not d.is_animated()


def test_gallery2_lossless_metadata(fixtures):
    for i in range(1, 6):
        data = (fixtures / "gallery2" / f"{i}_webp_ll.webp").read_bytes()
        d = WebPDecoder(data)
        assert not d.is_lossy
        assert d.width > 0 and d.height > 0


def test_gallery2_alpha_metadata(fixtures):
    for i in range(1, 6):
        data = (fixtures / "gallery2" / f"{i}_webp_a.webp").read_bytes()
        d = WebPDecoder(data)
        assert d.has_alpha


def test_animated_metadata(fixtures):
    for name, lossy in [("random_lossless.webp", False), ("random_lossy.webp", True)]:
        data = (fixtures / "animated" / name).read_bytes()
        d = WebPDecoder(data)
        assert d.is_animated()
        assert d.num_frames > 0
        assert d.is_lossy == lossy


def test_image_info(fixtures):
    data = (fixtures / "gallery1" / "1.webp").read_bytes()
    info = ImageInfo.from_webp(data)
    assert (info.width, info.height) == (550, 368)
    assert info.is_lossy and not info.is_animated


def test_animation_encoder_roundtrip():
    """AnimationEncoder (beyond the reference, which has no animation
    encoder): lossless frames round-trip exactly through our demuxer and
    through libwebp (PIL); diff-rect cropping applies after frame 0."""
    import io

    import numpy as np
    from PIL import Image

    from webp_tpu import AnimationEncoder, WebPDecoder

    rng = np.random.RandomState(2)
    W, H = 80, 64
    base = np.kron(
        rng.randint(0, 256, (8, 10, 4)).astype(np.uint8), np.ones((8, 8, 1), np.uint8)
    )
    base[:, :, 3] = 255
    frames = []
    for i in range(4):
        f = base.copy()
        f[10:30, 20 + 8 * i : 40 + 8 * i] = (255, 0, 0, 255)
        frames.append(f)

    enc = AnimationEncoder(W, H, loop_count=3)
    for f in frames:
        enc.add_frame(f, 40)
    data = enc.finish()

    d = WebPDecoder(data)
    assert d.loop_count == 3
    for i, f in enumerate(frames):
        img, dur = d.read_frame()
        assert dur == 40
        np.testing.assert_array_equal(img, f, err_msg=f"frame {i}")

    im = Image.open(io.BytesIO(data))
    assert im.n_frames == 4
    im.seek(2)
    np.testing.assert_array_equal(np.asarray(im.convert("RGBA")), frames[2])

    # lossy variant decodes everywhere with sane quality
    enc = AnimationEncoder(W, H, lossless=False, quality=80)
    for f in frames:
        enc.add_frame(f, 33)
    d = WebPDecoder(enc.finish())
    img, _ = d.read_frame()
    mse = np.mean((img[:, :, :3].astype(float) - frames[0][:, :, :3].astype(float)) ** 2)
    assert 10 * np.log10(255**2 / mse) > 20
