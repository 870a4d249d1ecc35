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
