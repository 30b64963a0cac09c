"""mp4 container depth: synthesized minimal ISO-BMFF files through
media.mp4_metadata / exiftool_video and the multimodal frame sampler."""

import struct

from unfurl_spark.functions.media import (
    exiftool_video,
    mp4_metadata,
)


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _mvhd(timescale: int, duration: int, version: int = 0) -> bytes:
    if version == 1:
        body = (bytes([1, 0, 0, 0]) + b"\x00" * 16
                + struct.pack(">I", timescale)
                + struct.pack(">Q", duration) + b"\x00" * 76)
    else:
        body = (b"\x00" * 4 + b"\x00" * 8
                + struct.pack(">I", timescale)
                + struct.pack(">I", duration) + b"\x00" * 76)
    return _box(b"mvhd", body)


def _tkhd(width: int, height: int) -> bytes:
    # version 0: 76 bytes before the 16.16 width/height pair
    body = (b"\x00" * 76
            + struct.pack(">I", width << 16)
            + struct.pack(">I", height << 16))
    return _box(b"tkhd", body)


def _minimal_mp4(brand: bytes = b"isom", timescale: int = 1000,
                 duration: int = 12500, width: int = 1920,
                 height: int = 1080, mvhd_version: int = 0) -> bytes:
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0) + b"isomiso2")
    moov = _box(b"moov",
                _mvhd(timescale, duration, mvhd_version)
                + _box(b"trak", _tkhd(0, 0))        # audio trak: 0x0
                + _box(b"trak", _tkhd(width, height)))
    return ftyp + moov + _box(b"mdat", b"\x00" * 32)


def test_mp4_metadata_dimensions_and_duration():
    meta = mp4_metadata(_minimal_mp4())
    assert meta["brand"] == "isom"
    assert meta["width"] == 1920 and meta["height"] == 1080
    assert meta["duration_s"] == 12.5


def test_mp4_metadata_version1_mvhd():
    meta = mp4_metadata(_minimal_mp4(timescale=600, duration=3000,
                                     mvhd_version=1))
    assert meta["duration_s"] == 5.0


def test_mp4_metadata_defensive_on_garbage():
    assert mp4_metadata(b"") == {}
    assert mp4_metadata(b"\x00" * 64) == {}
    # truncated / lying box sizes must not raise
    data = _minimal_mp4()
    assert isinstance(mp4_metadata(data[:40]), dict)
    evil = _box(b"ftyp", b"isom\x00\x00\x00\x00") + \
        struct.pack(">I", 2 ** 31) + b"moov"
    assert isinstance(mp4_metadata(evil), dict)


def test_exiftool_video_mime_from_brand():
    assert exiftool_video("u", _minimal_mp4(b"isom")) == {
        "type": "video", "url": "u", "encodingFormat": "video/mp4"}
    assert exiftool_video("u", _minimal_mp4(b"qt  "))["encodingFormat"] == \
        "video/quicktime"
    assert exiftool_video("u", _minimal_mp4(b"M4V "))["encodingFormat"] == \
        "video/x-m4v"
    assert exiftool_video("u", _minimal_mp4(b"3g2a"))["encodingFormat"] == \
        "video/3gpp2"
    # output shape stays exactly {type, url, encodingFormat} (reference
    # consumes only MIMEType — unfurl-exiftool/src/index.ts:69-74)
    assert set(exiftool_video("u", _minimal_mp4())) == {
        "type", "url", "encodingFormat"}


def test_frame_sampler_uses_real_duration(spark):
    from unfurl_spark.functions.multimodal import sample_frames

    clip = _minimal_mp4(duration=8000)  # 8 s at timescale 1000
    df = spark.createDataFrame(
        [("v1", clip), ("v2", b"not-a-video")],
        "media_ref string, payload binary")
    rows = sample_frames(df, n_frames=4).collect()
    ts = {r.media_ref: sorted([x.frame_ts_ms for x in rows
                               if x.media_ref == r.media_ref])
          for r in rows}
    assert ts["v1"] == [0, 2000, 4000, 6000]      # spread across 8 s
    assert ts["v2"] == [0, 1000, 2000, 3000]      # fallback interval


def test_decode_media_mp4_dims(spark):
    from unfurl_spark.functions.multimodal import decode_media

    df = spark.createDataFrame(
        [("v1", "video/mp4", _minimal_mp4(width=640, height=360))],
        "media_ref string, ctype string, payload binary")
    row = decode_media(df).collect()[0]
    assert row.container == "mp4"
    assert (row.width, row.height) == (640, 360)


def test_mvhd_v1_truncated_box_no_phantom_duration():
    """A version-1 mvhd whose payload stops before the 64-bit duration
    must not read the sibling box's header bytes as a duration."""
    import struct

    from unfurl_spark.functions.media import mp4_metadata

    ftyp = struct.pack(">I", 16) + b"ftypisom" + b"\x00" * 4
    mvhd_payload = b"\x01" + b"\x00" * 27              # v1, only 28 bytes
    mvhd = struct.pack(">I", 8 + len(mvhd_payload)) + b"mvhd" + mvhd_payload
    free = struct.pack(">I", 16) + b"free" + b"\x00" * 8
    moov = struct.pack(">I", 8 + len(mvhd) + len(free)) + b"moov" + mvhd + free
    meta = mp4_metadata(ftyp + moov)
    assert "duration_s" not in meta


# --- HEIF / AVIF still images ------------------------------------------------

def _box(tag: bytes, body: bytes) -> bytes:
    import struct
    return struct.pack(">I", 8 + len(body)) + tag + body


def _minimal_heif(major: bytes, w: int, h: int,
                  thumb: tuple[int, int] | None = (160, 120),
                  with_assoc: bool = True) -> bytes:
    """ftyp + meta{pitm, iprp{ipco[ispe(thumb), ispe(primary)], ipma}}.
    The primary item (id=1) is associated with the SECOND ispe so the
    test distinguishes pitm/ipma resolution from first-box luck."""
    import struct
    ftyp = _box(b"ftyp", major + struct.pack(">I", 0) + major + b"mif1")
    ispe_p = _box(b"ispe", b"\x00\x00\x00\x00" + struct.pack(">II", w, h))
    ipco_body = b""
    if thumb:
        ipco_body += _box(
            b"ispe", b"\x00\x00\x00\x00" + struct.pack(">II", *thumb))
    prop_idx = 2 if thumb else 1
    ipco_body += ispe_p
    ipco = _box(b"ipco", ipco_body)
    pitm = _box(b"pitm", b"\x00\x00\x00\x00" + struct.pack(">H", 1))
    # ipma v0 flags0: item 1 -> [prop_idx], item 2 -> [1] (thumb)
    entries = struct.pack(">I", 2 if thumb else 1)
    entries += struct.pack(">HBB", 1, 1, prop_idx)
    if thumb:
        entries += struct.pack(">HBB", 2, 1, 1)
    ipma = _box(b"ipma", b"\x00\x00\x00\x00" + entries)
    iprp = _box(b"iprp", ipco + (ipma if with_assoc else b""))
    meta = _box(b"meta", b"\x00\x00\x00\x00"
                + (pitm if with_assoc else b"") + iprp)
    return ftyp + meta


def test_heif_primary_item_dimensions():
    from unfurl_spark.functions.media import _sniff, heif_info

    data = _minimal_heif(b"heic", 4032, 3024)
    assert _sniff(data) == "heif"
    info = heif_info(data)
    assert (info["width"], info["height"]) == (4032, 3024)
    assert info["brand"] == "heic"


def test_heif_primary_beats_larger_auxiliary_ispe():
    """An auxiliary item (e.g. a full-res depth map) larger than the
    primary must not win: pitm/ipma resolution, not the size fallback."""
    from unfurl_spark.functions.media import heif_info

    data = _minimal_heif(b"heic", 1280, 960, thumb=(4096, 4096))
    info = heif_info(data)
    assert (info["width"], info["height"]) == (1280, 960)


def test_avif_sniff_and_dims():
    from unfurl_spark.functions.media import _sniff, heif_info

    data = _minimal_heif(b"avif", 1920, 1080, thumb=None)
    assert _sniff(data) == "avif"
    info = heif_info(data)
    assert (info["width"], info["height"]) == (1920, 1080)


def test_heif_truncated_assoc_falls_back_to_largest_ispe():
    from unfurl_spark.functions.media import heif_info

    data = _minimal_heif(b"heic", 4032, 3024, with_assoc=False)
    info = heif_info(data)
    assert (info["width"], info["height"]) == (4032, 3024)


def test_heif_exiftool_arm_reports_dims_exif_arm_bare():
    from unfurl_spark.functions.media import exif_image, exiftool_image

    data = _minimal_heif(b"heic", 640, 480)
    et = exiftool_image("https://x.test/a.heic", data)
    assert (et["width"], et["height"]) == (640.0, 480.0)
    assert et["encodingFormat"] == "image/heic"
    # ExifReader 3.x throws on HEIC -> reference's exif arm yields bare image
    ex = exif_image("https://x.test/a.heic", data, "image/heic")
    assert ex == {"type": "image", "url": "https://x.test/a.heic"}


def test_avif_decode_media_dims(spark):
    from unfurl_spark.functions.multimodal import decode_media

    df = spark.createDataFrame(
        [("i1", "image/avif", _minimal_heif(b"avif", 800, 600))],
        "media_ref string, ctype string, payload binary")
    row = decode_media(df).collect()[0]
    assert row.container == "avif"
    assert (row.width, row.height) == (800, 600)
    assert row.ok == "codec:unavailable"  # AV1 essence decode is a
    # flagged boundary; header dims are real


def test_heif_exif_item_camera_tags():
    """HEIC Exif item (iinf 'Exif' + iloc extent) feeds the exiftool
    arm's camera fields — matching exiftool's HEIC support."""
    import struct

    from unfurl_spark.functions.media import exiftool_image, heif_info

    # TIFF blob with Make/Model in IFD0 (values inline / offset)
    def tiff_with_make_model():
        make, model = b"ACME\x00\x00\x00\x00", b"Cam-1\x00\x00\x00"
        hdr = b"II*\x00" + struct.pack("<I", 8)
        n = struct.pack("<H", 2)
        e1 = struct.pack("<HHI4s", 0x010F, 2, 5, b"ACME")  # fits inline? 5>4
        # use offsets: entries end at 8+2+24+4 = 38
        e1 = struct.pack("<HHII", 0x010F, 2, 5, 38)
        e2 = struct.pack("<HHII", 0x0110, 2, 6, 46)
        return hdr + n + e1 + e2 + struct.pack("<I", 0) \
            + b"ACME\x00\x00\x00\x00" + b"Cam-1\x00\x00\x00"

    tiff = tiff_with_make_model()
    ftyp = _box(b"ftyp", b"heic" + struct.pack(">I", 0) + b"heic")
    ispe = _box(b"ispe", b"\x00\x00\x00\x00" + struct.pack(">II", 64, 48))
    ipco = _box(b"ipco", ispe)
    pitm = _box(b"pitm", b"\x00\x00\x00\x00" + struct.pack(">H", 1))
    ipma = _box(b"ipma", b"\x00\x00\x00\x00" + struct.pack(">I", 1)
                + struct.pack(">HBB", 1, 1, 1))
    iprp = _box(b"iprp", ipco + ipma)
    infe = _box(b"infe", b"\x02\x00\x00\x00" + struct.pack(">HH", 2, 0)
                + b"Exif\x00\x00")
    iinf = _box(b"iinf", b"\x00\x00\x00\x00" + struct.pack(">H", 1) + infe)
    # exif payload goes after everything; compute its absolute offset
    exif_payload = struct.pack(">I", 0) + tiff  # 4-byte tiff-header offset
    # iloc v0: sizes 4/4, base 0 -> offset_size=4 length_size=4 base=0
    # build meta with a placeholder iloc then fix offset
    def build(exif_off):
        iloc = _box(b"iloc", b"\x00\x00\x00\x00" + bytes([0x44, 0x00])
                    + struct.pack(">H", 1) + struct.pack(">H", 2)
                    + struct.pack(">H", 0) + struct.pack(">H", 1)
                    + struct.pack(">II", exif_off, len(exif_payload)))
        meta = _box(b"meta", b"\x00\x00\x00\x00" + pitm + iinf + iloc + iprp)
        return ftyp + meta
    base = build(0)
    data = build(len(base)) + exif_payload
    info = heif_info(data)
    assert (info["width"], info["height"]) == (64, 48)
    assert info["exif"]["Make"] == "ACME"
    assert info["exif"]["Model"] == "Cam-1"
    et = exiftool_image("https://x.test/c.heic", data)
    assert et["camera"]["make"] == "ACME"
    assert et["camera"]["model"] == "Cam-1"
    assert (et["width"], et["height"]) == (64.0, 48.0)


def test_heif_exif_item_infe_v3():
    """infe v3 carries a 32-bit item_ID, shifting item_type to +10 —
    regression for the fixed-offset read that could never match v3."""
    import struct

    from unfurl_spark.functions.media import heif_info

    tiff = (b"II*\x00" + struct.pack("<I", 8) + struct.pack("<H", 1)
            + struct.pack("<HHII", 0x010F, 2, 5, 26) + struct.pack("<I", 0)
            + b"AC-3\x00")
    ftyp = _box(b"ftyp", b"heic" + struct.pack(">I", 0) + b"heic")
    ispe = _box(b"ispe", b"\x00\x00\x00\x00" + struct.pack(">II", 32, 16))
    ipco = _box(b"ipco", ispe)
    pitm = _box(b"pitm", b"\x00\x00\x00\x00" + struct.pack(">H", 1))
    ipma = _box(b"ipma", b"\x00\x00\x00\x00" + struct.pack(">I", 1)
                + struct.pack(">HBB", 1, 1, 1))
    iprp = _box(b"iprp", ipco + ipma)
    # infe VERSION 3: 32-bit item_ID (=2), 16-bit protection, item_type
    infe = _box(b"infe", b"\x03\x00\x00\x00" + struct.pack(">IH", 2, 0)
                + b"Exif\x00\x00")
    iinf = _box(b"iinf", b"\x00\x00\x00\x00" + struct.pack(">H", 1) + infe)
    exif_payload = struct.pack(">I", 0) + tiff

    def build(exif_off):
        iloc = _box(b"iloc", b"\x00\x00\x00\x00" + bytes([0x44, 0x00])
                    + struct.pack(">H", 1) + struct.pack(">H", 2)
                    + struct.pack(">H", 0) + struct.pack(">H", 1)
                    + struct.pack(">II", exif_off, len(exif_payload)))
        meta = _box(b"meta", b"\x00\x00\x00\x00" + pitm + iinf + iloc + iprp)
        return ftyp + meta

    data = build(len(build(0))) + exif_payload
    info = heif_info(data)
    assert (info["width"], info["height"]) == (32, 16)
    assert info["exif"]["Make"] == "AC-3"
