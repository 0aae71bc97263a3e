"""Pure-stdlib GIF and BMP codecs (functions/gif.py, functions/bmp.py)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from agentic_doc_spark.functions.bmp import decode_bmp, encode_bmp, is_bmp
from agentic_doc_spark.functions.gif import (
    decode_gif,
    encode_gif,
    gif_frames,
    is_gif,
)


def _img(seed=7, shape=(23, 31), colors=16):
    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, (colors, 3), dtype=np.uint8)
    return pal[rng.randint(0, colors, shape)]


def test_gif_roundtrip_plain_and_interlaced():
    img = _img()
    for interlace in (False, True):
        data = encode_gif([img], interlace=interlace)
        assert is_gif(data) and data[:6] == b"GIF89a"
        assert np.array_equal(decode_gif(data), img)


def test_gif_lzw_width_growth_and_reset():
    # enough pixels to grow the code width to 12 bits and reset the
    # dictionary at 4096 entries
    img = _img(seed=3, shape=(200, 300))
    assert np.array_equal(decode_gif(encode_gif([img])), img)


def test_gif_animation_composes_frames():
    frames = [_img(seed=s) for s in (1, 2, 3)]
    dec = gif_frames(encode_gif(frames))
    assert len(dec) == 3
    for a, b in zip(dec, frames):
        assert np.array_equal(a, b)


def test_gif_transparency_leaves_canvas():
    # frame 2 is entirely transparent-index → composed frame 2 must
    # still show frame 1
    pal_img = np.zeros((4, 4, 3), dtype=np.uint8)
    pal_img[:, :, 0] = 200  # solid red-ish
    f2 = np.full((4, 4, 3), 7, dtype=np.uint8)
    # the encoder's palette is the sorted distinct-color list, so the
    # index of (7,7,7) is predictable
    colors = sorted({(200, 0, 0), (7, 7, 7)})
    t_idx = colors.index((7, 7, 7))
    data = encode_gif([pal_img, f2], transparent_index=t_idx)
    dec = gif_frames(data)
    assert np.array_equal(dec[1], dec[0])


def test_gif_corrupt_raises():
    img = _img()
    data = bytearray(encode_gif([img]))
    data[0:3] = b"XXX"
    with pytest.raises(ValueError):
        decode_gif(bytes(data))
    # implausible dimensions guard
    bad = bytearray(encode_gif([img]))
    struct.pack_into("<HH", bad, 6, 65535, 65535)
    with pytest.raises(ValueError):
        decode_gif(bytes(bad))


def test_bmp_roundtrip_24bit():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (17, 23, 3), dtype=np.uint8)
    data = encode_bmp(img)
    assert is_bmp(data)
    assert np.array_equal(decode_bmp(data), img)


def test_bmp_paletted_8bit():
    rng = np.random.RandomState(9)
    pal = rng.randint(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.randint(0, 16, (9, 13)).astype(np.uint8)
    stride = (13 + 3) & ~3
    body = b"".join(
        idx[y].tobytes() + b"\x00" * (stride - 13) for y in range(8, -1, -1)
    )
    palbytes = b"".join(
        bytes([int(c[2]), int(c[1]), int(c[0]), 0]) for c in pal
    )
    hdr = struct.pack(
        "<2sIHHI", b"BM", 0, 0, 0, 14 + 40 + len(palbytes)
    ) + struct.pack(
        "<IiiHHIIiiII", 40, 13, 9, 1, 8, 0, len(body), 0, 0, 16, 0
    )
    assert np.array_equal(decode_bmp(hdr + palbytes + body), pal[idx])


def test_bmp_rejects_compressed():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    data = bytearray(encode_bmp(img))
    struct.pack_into("<I", data, 30, 1)  # BI_RLE8
    with pytest.raises(ValueError):
        decode_bmp(bytes(data))


def test_decode_ladder_handles_gif_and_bmp():
    from agentic_doc_spark.operators.multimodal import _decode_array

    img = _img(seed=11)
    assert np.array_equal(_decode_array(encode_gif([img])), img)
    rng = np.random.RandomState(12)
    img24 = rng.randint(0, 256, (8, 9, 3), dtype=np.uint8)
    assert np.array_equal(_decode_array(encode_bmp(img24)), img24)


def test_sample_frames_real_animated_gif(spark):
    from agentic_doc_spark.operators.multimodal import sample_frames

    frames = [_img(seed=s, shape=(6, 8)) for s in range(5)]
    data = encode_gif(frames)
    media = spark.createDataFrame(
        [("media://g/anim0", bytearray(data))],
        "media_ref string, content binary",
    )
    rows = sorted(
        sample_frames(media, every_n=2).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [r["frame_idx"] for r in rows] == [0, 2, 4]
    assert all(
        r["decoded"] and r["width"] == 8 and r["height"] == 6 for r in rows
    )


def test_gif_fuzz_truncation_and_corruption_fold_to_valueerror():
    # corrupt/truncated GIFs must raise ValueError (or decode) — never
    # hang, MemoryError, IndexError, or struct.error
    import random

    rng = random.Random(41)
    data = encode_gif([_img(seed=21, shape=(16, 20))])
    for cut in range(7, len(data), max(1, len(data) // 50)):
        try:
            decode_gif(data[:cut])
        except ValueError:
            pass
    for _ in range(300):
        b = bytearray(data)
        for _ in range(rng.randint(1, 6)):
            b[rng.randrange(6, len(b))] = rng.randrange(256)
        try:
            decode_gif(bytes(b))
        except ValueError:
            pass


def test_bmp_fuzz_truncation_and_corruption_fold_to_valueerror():
    import random

    rng = random.Random(43)
    img = _img(seed=22, shape=(12, 14))
    data = encode_bmp(img)
    for cut in range(2, len(data), max(1, len(data) // 40)):
        try:
            decode_bmp(data[:cut])
        except ValueError:
            pass
    for _ in range(300):
        b = bytearray(data)
        for _ in range(rng.randint(1, 5)):
            b[rng.randrange(2, len(b))] = rng.randrange(256)
        try:
            decode_bmp(bytes(b))
        except ValueError:
            pass


def test_gif_stride_matches_full_decode():
    frames = [_img(seed=s, shape=(7, 9)) for s in range(7)]
    data = encode_gif(frames)
    full = gif_frames(data)
    strided = gif_frames(data, stride=3)
    assert len(strided) == 3
    for a, b in zip(strided, full[::3]):
        assert np.array_equal(a, b)


def test_gif_disposal_restore_to_previous():
    import struct as st

    # two frames; patch frame 1's GCE disposal to 3 (restore-previous):
    # frame 2's composition must start from the ORIGINAL canvas
    f1 = np.full((4, 4, 3), 10, dtype=np.uint8)
    f2 = np.full((4, 4, 3), 20, dtype=np.uint8)
    colors = sorted({(10, 10, 10), (20, 20, 20), (30, 30, 30)})
    t_idx = colors.index((30, 30, 30))
    # frame 2 entirely transparent → shows what disposal left behind
    f2t = np.full((4, 4, 3), 30, dtype=np.uint8)
    data = bytearray(encode_gif([f1, f2, f2t], transparent_index=t_idx))
    # set disposal=3 on the SECOND frame's graphic control (find GCEs)
    gces = []
    i = 0
    while i < len(data) - 1:
        if data[i] == 0x21 and data[i + 1] == 0xF9:
            gces.append(i)
            i += 8
        else:
            i += 1
    assert len(gces) == 3
    packed = data[gces[1] + 3]
    data[gces[1] + 3] = (packed & ~0x1C) | (3 << 2)
    dec = gif_frames(bytes(data))
    # frame 3 is fully transparent: with disposal 3 on frame 2, the
    # canvas reverted to frame 1's pixels
    assert np.array_equal(dec[2], dec[0])


def test_sniff_bmp_rejects_text():
    from agentic_doc_spark.functions.bmp import sniff_bmp

    assert not sniff_bmp(("BMW sales rose sharply. " * 10).encode())
    rng = np.random.RandomState(3)
    real = encode_bmp(rng.randint(0, 256, (6, 7, 3), dtype=np.uint8))
    assert sniff_bmp(real)


def test_bmp_bitfields_nondefault_masks_surfaced():
    import struct as st

    img = np.zeros((4, 4, 3), dtype=np.uint8)
    data = bytearray(encode_bmp(img))
    st.pack_into("<I", data, 30, 3)  # BI_BITFIELDS
    # no mask bytes present → truncated masks error; with wrong masks
    # appended the decoder must refuse rather than swap channels
    with pytest.raises(ValueError):
        decode_bmp(bytes(data))
