"""Round-11 referees: ADVICE r10 closures (BMP core-header loud-fail)
and the large-star/small-star connected-components path."""

from __future__ import annotations

import pytest

from go_zoom_kinesis_spark.registry import all_queries

Q = all_queries()


# --- decode_image: BITMAPCOREHEADER must fail loudly (ADVICE r10) --------


def test_decode_bmp_coreheader_fails_loudly():
    """bpp/biCompression live at offsets 28/30 only for
    BITMAPINFOHEADER (hdr_size >= 40); a BITMAPCOREHEADER
    (hdr_size = 12: 16-bit width/height, no compression field) must
    raise instead of misparsing garbage offsets."""
    import struct

    # valid-looking BMP file header + a 12-byte BITMAPCOREHEADER
    # (w=4, h=4, planes=1, bpp=24) padded so len > 54
    core = struct.pack("<IHHHH", 12, 4, 4, 1, 24)
    payload = (
        struct.pack("<2sIHHI", b"BM", 26 + 48, 0, 0, 26)
        + core
        + b"\x00" * 64
    )
    from go_zoom_kinesis_spark.operators.multimodal import decode_image

    with pytest.raises(NotImplementedError, match="header size 12"):
        decode_image(payload)


def test_decode_bmp_v4_header_still_decodes():
    """hdr_size > 40 (BITMAPV4/V5) keeps the INFOHEADER field layout
    for the first 40 bytes — those must keep decoding."""
    import struct

    import numpy as np

    from go_zoom_kinesis_spark.operators.multimodal import (
        decode_image,
        synth_raster,
    )

    pix = synth_raster(3)
    h, w, _ = pix.shape
    row_bytes = (w * 3 + 3) // 4 * 4
    body = np.zeros((h, row_bytes), np.uint8)
    body[:, : w * 3] = pix[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    hdr_size = 108  # BITMAPV4HEADER
    data_ofs = 14 + hdr_size
    head = struct.pack(
        "<2sIHHI", b"BM", data_ofs + body.size, 0, 0, data_ofs
    ) + struct.pack(
        "<IiiHHIIiiII", hdr_size, w, h, 1, 24, 0, body.size, 2835, 2835, 0, 0
    )
    head += b"\x00" * (data_ofs - len(head))
    img = decode_image(head + body.tobytes())
    assert np.array_equal(img.pixels, pix)
