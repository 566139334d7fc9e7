"""FITS tile compression: RICE_1 codec + ZIMAGE/VLA container."""

from __future__ import annotations

import numpy as np
import pytest

from lsd_spark.sources.fits_tile import (
    _make_rice_codec,
    _make_rice_image_parser,
    write_fits_rice,
)


def test_rice_roundtrip_all_escape_paths():
    """One case per bitstream path: zero blocks (code 0), small
    split levels, the unencoded escape (full-range noise), 16-bit
    wraparound diffs, and a non-multiple-of-32 tail block."""
    enc, dec = _make_rice_codec()
    rng = np.random.RandomState(0)
    cases = [
        np.full(64, 1234, np.int16),                       # zero blocks
        (np.arange(64) * 13 - 3000).astype(np.int16),      # constant diff
        rng.randint(-32768, 32768, 100).astype(np.int16),  # unencoded
        np.array([-32768, 32767] * 40, np.int16),          # wraparound
        rng.randint(-50, 50, 33).astype(np.int16),         # tail block
        np.array([-5], np.int16),                          # single pixel
    ]
    for a in cases:
        assert list(dec(enc(a), len(a))) == [int(v) for v in a]


def test_rice_compression_ratios():
    """The format must actually compress where it should and never
    blow up where it can't: constant data ~FSBITS/32 bits per pixel,
    small-sigma noise well under 1x, full-range noise capped near 1x
    (unencoded escape costs 4 bits per 32 pixels)."""
    enc, _ = _make_rice_codec()
    rng = np.random.RandomState(7)
    const = enc(np.full(4096, 77, np.int16))
    assert len(const) < 4096 * 2 * 0.01
    noise = enc((500 + rng.randint(-4, 5, 4096)).astype(np.int16))
    assert len(noise) < 4096 * 2 * 0.30
    rand = enc(rng.randint(-32768, 32768, 4096).astype(np.int16))
    assert len(rand) < 4096 * 2 * 1.03


def test_rice_property_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    enc, dec = _make_rice_codec()

    @settings(max_examples=60, deadline=None)
    @given(
        st.integers(min_value=0, max_value=2**31 - 1),
        st.integers(min_value=1, max_value=300),
        st.sampled_from(["random", "walk", "constant", "ramp", "spike"]),
    )
    def check(seed, n, kind):
        rng = np.random.RandomState(seed)
        if kind == "random":
            a = rng.randint(-32768, 32768, n)
        elif kind == "walk":
            a = np.cumsum(rng.randint(-9, 10, n)).clip(-32768, 32767)
        elif kind == "constant":
            a = np.full(n, rng.randint(-32768, 32768))
        elif kind == "spike":
            # flat background + isolated stars: long unary runs
            a = np.full(n, rng.randint(-100, 100))
            for i in rng.choice(n, size=max(1, n // 20), replace=False):
                a[i] += rng.randint(1, 400)
        else:
            a = (np.arange(n) * rng.randint(-200, 201)).clip(-32768, 32767)
        a = a.astype(np.int16)
        assert list(dec(enc(a), n)) == [int(v) for v in a]

    check()


def test_rice_flat_plus_spike_roundtrip():
    """Star-on-flat-background shape: one isolated spike in an
    otherwise constant block drives the split level low (fs=1) and
    the unary run high (top ~u>>fs, legitimately past BBITS for
    bytepix=4) — the runaway-unary guard must admit the encoder's
    true worst case NBLOCK + (NBLOCK//2 >> fs)."""
    for bp, spikes in ((2, (17, 23, 40, 300)), (4, (17, 48, 10**6))):
        enc, dec = _make_rice_codec(bp)
        for s in spikes:
            a = np.zeros(33, np.int64)
            a[16] = s
            assert list(dec(enc(a), 33)) == [int(v) for v in a]
            # spike in the tail block too
            b = np.zeros(40, np.int64)
            b[39] = s
            assert list(dec(enc(b), 40)) == [int(v) for v in b]


def test_rice_rejects_pad_bits_at_exact_stream_end():
    """A constant 32-pixel block encodes to seed + one FSBITS code,
    leaving 4 pad bits in the final byte; decode consumes the whole
    stream (pos == len) with those bits left over — non-zero pad
    there must still raise (the trailing-garbage contract)."""
    enc, dec = _make_rice_codec()
    a = np.full(32, 5, np.int16)
    s = bytearray(enc(a))
    assert len(s) == 3  # 2-byte seed + 4-bit code 0 + 4 pad bits
    assert list(dec(bytes(s), 32)) == [5] * 32
    s[-1] |= 0b0000_1000  # poison the first pad bit
    with pytest.raises(ValueError, match="trailing garbage"):
        dec(bytes(s), 32)


def test_zimage_zname_pairs_in_either_order(tmp_path):
    """A conforming fpack file may emit the BYTEPIX/BLOCKSIZE
    ZNAME/ZVAL pairs in the opposite order; the parser must resolve
    ZVALn by its ZNAMEn label, not by position."""
    from lsd_spark.sources.fits import _card

    rng = np.random.RandomState(6)
    img = rng.randint(-500, 500, (5, 12)).astype(np.int64)
    p = str(tmp_path / "sw.fits")
    write_fits_rice(p, img)
    buf = bytearray(open(p, "rb").read())

    def swap(old: bytes, new: bytes) -> None:
        i = bytes(buf).index(old)
        assert len(old) == len(new) == 80
        buf[i : i + 80] = new

    swap(_card("ZNAME1", "BLOCKSIZE"), _card("ZNAME1", "BYTEPIX"))
    swap(_card("ZVAL1", 32), _card("ZVAL1", 2))
    swap(_card("ZNAME2", "BYTEPIX"), _card("ZNAME2", "BLOCKSIZE"))
    swap(_card("ZVAL2", 2), _card("ZVAL2", 32))
    parse = _make_rice_image_parser()
    hdr, back, _ = parse(bytes(buf))
    assert hdr["ZNAME1"] == "BYTEPIX" and int(hdr["ZVAL1"]) == 2
    assert (back == img).all()


def test_rice_rejects_malformed():
    enc, dec = _make_rice_codec()
    good = enc((np.arange(100) * 7).astype(np.int16))
    with pytest.raises(ValueError, match="seed"):
        dec(good[:1], 100)
    with pytest.raises(ValueError, match="truncated"):
        dec(good[: len(good) // 2], 100)
    with pytest.raises(ValueError, match="trailing garbage"):
        dec(good + b"\x55", 100)


def test_zimage_container_roundtrip(tmp_path):
    """write_fits_rice -> parse_rice: the VLA descriptors must
    resolve into the heap, every row tile must decode, and the
    header must carry the fpack convention cards."""
    rng = np.random.RandomState(3)
    img = (rng.randint(-2000, 2000, (16, 40))).astype(np.int16)
    p = str(tmp_path / "z.fits")
    write_fits_rice(p, img.astype(np.int64), extra_cards={"NATKEY": 9})
    parse = _make_rice_image_parser()
    hdr, back, heap_used = parse(open(p, "rb").read())
    assert hdr["ZCMPTYPE"] == "RICE_1"
    assert (back == img).all()
    assert heap_used == int(hdr["PCOUNT"])
    assert int(hdr["ZNAXIS1"]) == 40 and int(hdr["ZNAXIS2"]) == 16
    assert hdr["NATKEY"] == "9"


def test_zimage_rejects_descriptor_outside_heap(tmp_path):
    rng = np.random.RandomState(4)
    img = rng.randint(-100, 100, (4, 8)).astype(np.int64)
    p = str(tmp_path / "bad.fits")
    write_fits_rice(p, img)
    buf = bytearray(open(p, "rb").read())
    # find the bintable data start: after 2 headers (primary is one
    # block, table header is one block for this small card count)
    from lsd_spark.sources.fits import _make_image_parser

    read_cards, data_size, _ = _make_image_parser()
    hdr0, off = read_cards(bytes(buf), 0)
    off += data_size(hdr0)
    hdr, doff = read_cards(bytes(buf), off)
    # corrupt row 0's heap offset to point past the heap
    import struct

    struct.pack_into(">i", buf, doff + 4, 10**6)
    parse = _make_rice_image_parser()
    with pytest.raises(ValueError, match="outside heap"):
        parse(bytes(buf))


def test_source_fits_rice_matches_uncompressed_stats(spark):
    """The registered op's statistics must equal source_fits_image's
    closed form — the compressed and uncompressed readers see the
    same physical counts."""
    from lsd_spark.registry import QUERIES, load_all
    from tests.conftest import SF_DIR

    load_all()
    rows = QUERIES["source_fits_rice"](spark, SF_DIR).collect()
    assert len(rows) == 25
    for r in rows:
        k = r["natkey"]
        assert r["n_tiles"] == 8
        assert r["px_sum"] == 16448 * k + 26208
        assert r["px_min"] == 257 * k
        assert r["px_max"] == 257 * k + 819
        assert r["compressed_smaller"] is True


def test_rice_bytepix4_roundtrip_and_container(tmp_path):
    """BYTEPIX=4 (FSBITS=5/FSMAX=25/BBITS=32 — fpack's 32-bit and
    quantized-float layout): full-range int32 data must round-trip
    through both the bare codec and the ZIMAGE container, and the
    container must advertise ZBITPIX=32/ZVAL2=4."""
    from lsd_spark.sources.fits_tile import (
        _make_rice_codec,
        _make_rice_image_parser,
        write_fits_rice,
    )

    enc, dec = _make_rice_codec(4)
    rng = np.random.RandomState(2)
    a = rng.randint(-(2**31), 2**31, 500).astype(np.int64)
    assert list(dec(enc(a), 500)) == [int(v) for v in a]
    # wraparound at the int32 extremes
    b = np.array([-(2**31), 2**31 - 1] * 40, np.int64)
    assert list(dec(enc(b), 80)) == [int(v) for v in b]

    img = rng.randint(-(2**28), 2**28, (6, 20)).astype(np.int64)
    p = str(tmp_path / "z4.fits")
    write_fits_rice(p, img, bytepix=4)
    parse = _make_rice_image_parser()
    hdr, back, _heap = parse(open(p, "rb").read())
    assert int(hdr["ZBITPIX"]) == 32 and int(hdr["ZVAL2"]) == 4
    assert (back == img).all()


def test_rice_rejects_unknown_bytepix():
    from lsd_spark.sources.fits_tile import _make_rice_codec

    with pytest.raises(ValueError, match="BYTEPIX"):
        _make_rice_codec(8)


def test_zimage_cutout_decodes_only_intersecting_tiles(tmp_path):
    """The cutout path: a row window decodes exactly its tiles'
    heap spans (heap_used == the window's compressed bytes, strictly
    less than PCOUNT) and returns the right pixels."""
    rng = np.random.RandomState(5)
    img = rng.randint(-999, 999, (32, 24)).astype(np.int64)
    p = str(tmp_path / "cut.fits")
    write_fits_rice(p, img)
    parse = _make_rice_image_parser()
    buf = open(p, "rb").read()
    hdr_full, full, heap_full = parse(buf)
    hdr, cut, heap_cut = parse(buf, y_range=(10, 14))
    assert (cut == img[10:14]).all()
    assert heap_cut < heap_full == int(hdr_full["PCOUNT"])
    with pytest.raises(ValueError, match="outside image"):
        parse(buf, y_range=(30, 40))


def test_gzip_tile_codec_roundtrip_and_malformed():
    from lsd_spark.sources.fits_tile import _gzip_tile_codec

    for bp, lo, hi in ((2, -32768, 32768), (4, -(2**31), 2**31)):
        enc, dec = _gzip_tile_codec(bp)
        rng = np.random.RandomState(bp)
        a = rng.randint(lo, hi, 96).astype(np.int64)
        assert list(dec(enc(a), 96)) == [int(v) for v in a]
        assert enc(a) == enc(a)  # mtime pinned: byte-deterministic
    enc, dec = _gzip_tile_codec(2)
    good = enc(np.arange(32))
    with pytest.raises(ValueError, match="bad tile stream"):
        dec(good[:-4], 32)
    with pytest.raises(ValueError, match="expected 40"):
        dec(good, 40)
    with pytest.raises(ValueError, match="BYTEPIX"):
        _gzip_tile_codec(3)


def test_zimage_gzip_container_and_multirow_cutout(tmp_path):
    """GZIP_1 with ZTILE2=2: full read reassembles, a cutout whose
    row window crosses a tile boundary decodes exactly the two
    intersecting tiles (heap_used < PCOUNT) and slices to the exact
    rows."""
    rng = np.random.RandomState(9)
    img = rng.randint(-5000, 5000, (8, 12)).astype(np.int64)
    p = str(tmp_path / "gz.fits")
    write_fits_rice(p, img, cmptype="GZIP_1", tile_rows=2)
    parse = _make_rice_image_parser()
    buf = open(p, "rb").read()
    hdr, back, heap_full = parse(buf)
    assert hdr["ZCMPTYPE"] == "GZIP_1" and int(hdr["ZTILE2"]) == 2
    assert int(hdr["NAXIS2"]) == 4  # 4 tiles of 2 rows
    assert (back == img).all()
    assert heap_full == int(hdr["PCOUNT"])
    # rows [3, 6) intersect tiles 1 and 2 (rows 2..5) -> slice 3..5
    hdr, cut, heap_cut = parse(buf, y_range=(3, 6))
    assert (cut == img[3:6]).all()
    assert 0 < heap_cut < heap_full


def test_rice_multirow_tiles_roundtrip(tmp_path):
    """RICE_1 also accepts ZTILE2>1 (each tile's predictor chain runs
    across its rows) — round-trips and cutouts agree with row tiling."""
    rng = np.random.RandomState(10)
    img = rng.randint(-300, 300, (12, 10)).astype(np.int64)
    p = str(tmp_path / "r3.fits")
    write_fits_rice(p, img, tile_rows=3)
    parse = _make_rice_image_parser()
    buf = open(p, "rb").read()
    hdr, back, _ = parse(buf)
    assert (back == img).all() and int(hdr["NAXIS2"]) == 4
    _, cut, _ = parse(buf, y_range=(4, 8))
    assert (cut == img[4:8]).all()


def test_tiled_writer_rejects_bad_args(tmp_path):
    img = np.zeros((8, 8), np.int64)
    with pytest.raises(ValueError, match="ZCMPTYPE"):
        write_fits_rice(str(tmp_path / "x.fits"), img, cmptype="PLIO_1")
    with pytest.raises(ValueError, match="divide"):
        write_fits_rice(str(tmp_path / "y.fits"), img, tile_rows=3)


# --- HCOMPRESS_1 (round 13) --------------------------------------------------


def test_hcompress_roundtrip_property():
    """Lossless round-trip across shapes (even, odd -> fewer/zero
    transform levels, single-row) and both BYTEPIX widths, full
    dtype range; streams are byte-deterministic."""
    from lsd_spark.sources.fits_tile import _hcompress_codec

    rng = np.random.RandomState(13)
    for bp, lo, hi in ((2, -32768, 32768), (4, -(2**31), 2**31 - 1)):
        for shape in ((8, 8), (4, 8), (5, 7), (1, 64), (16, 16), (8, 6)):
            a = rng.randint(lo, hi, shape).astype(np.int64)
            enc, dec = _hcompress_codec(bp, tile_shape=shape)
            out = dec(enc(a.reshape(-1)), a.size)
            assert np.array_equal(
                np.asarray(out).reshape(shape), a
            ), (bp, shape)
            assert enc(a.reshape(-1)) == enc(a.reshape(-1))


def test_hcompress_transform_exactness_edges():
    """The undivided H-transform's inverse must be EXACT division
    (never floor-rounding) — pinned on adversarial parity patterns
    and the dtype extremes where a wraparound slip would show."""
    from lsd_spark.sources.fits_tile import _hcompress_codec

    enc, dec = _hcompress_codec(2, tile_shape=(4, 4))
    for img in (
        np.array([[1, 0, 0, 0]] * 4),
        np.array([[0, 1], [1, 0]] * 2)[:4, :4].repeat(2, 1)[:, :4],
        np.full((4, 4), 32767),
        np.full((4, 4), -32768),
        np.arange(16).reshape(4, 4) % 3 - 1,
    ):
        a = np.asarray(img, dtype=np.int64)
        assert np.array_equal(
            np.asarray(dec(enc(a.reshape(-1)), 16)).reshape(4, 4), a
        )


def test_hcompress_lossy_scale_bounded_error():
    """SCALE>1 quantizes every coefficient with round-half-away:
    reconstruction error per pixel stays <= scale (the geometric
    series of per-level /4 error propagation), and higher scale
    compresses smaller on noisy data."""
    from lsd_spark.sources.fits_tile import _hcompress_codec

    rng = np.random.RandomState(7)
    a = rng.randint(-1000, 1000, (16, 16)).astype(np.int64)
    sizes = []
    for scale in (1, 8, 64):
        enc, dec = _hcompress_codec(2, scale=scale, tile_shape=(16, 16))
        blob = enc(a.reshape(-1))
        out = np.asarray(dec(blob, 256)).reshape(16, 16)
        err = np.abs(out - a).max()
        assert err <= scale, (scale, err)
        if scale == 1:
            assert err == 0
        sizes.append(len(blob))
    assert sizes[0] > sizes[1] > sizes[2], sizes


def test_hcompress_rejects_malformed():
    """Corruption fuzz, tests/test_fits_rice.py style: truncated
    header/stream, bad magic, BYTEPIX mismatch, pixel-count
    mismatch, short payload, trailing garbage, flipped body bits —
    every mutation raises, never a short/garbage tile."""
    from lsd_spark.sources.fits_tile import _hcompress_codec

    enc, dec = _hcompress_codec(2, tile_shape=(8, 8))
    a = np.arange(64, dtype=np.int64)
    good = enc(a)
    with pytest.raises(ValueError, match="shorter than the header"):
        dec(good[:10], 64)
    with pytest.raises(ValueError, match="bad magic"):
        dec(b"\x00" + good[1:], 64)
    with pytest.raises(ValueError, match="BYTEPIX"):
        dec(good[:2] + b"\x04" + good[3:], 64)
    with pytest.raises(ValueError, match="expected 60"):
        dec(good, 60)
    with pytest.raises(ValueError, match="bad coefficient stream"):
        dec(good[:-6], 64)
    with pytest.raises(ValueError, match="bad coefficient stream|expected"):
        dec(good + b"\x99garbage", 64)
    # flip a byte inside the deflate DATA or the CRC trailer (not
    # the first gzip-header bytes — mtime is ignored by decompress)
    for i in (15 + 12, len(good) // 2, len(good) - 6):
        bad = bytearray(good)
        bad[i] ^= 0xFF
        with pytest.raises(ValueError):
            dec(bytes(bad), 64)
    with pytest.raises(ValueError, match="BYTEPIX 3"):
        _hcompress_codec(3)
    with pytest.raises(ValueError, match="needs tile_shape"):
        _hcompress_codec(2)[0](a)


def test_hcompress_container_roundtrip_and_cutout(tmp_path):
    """HCOMPRESS_1 through the full ZIMAGE container: write with
    multi-row tiles, re-read via the dispatching parser (SCALE/
    BYTEPIX resolved by ZNAMEn label), byte-exact image, and a
    tile-granular cutout decodes only intersecting tiles."""
    from lsd_spark.sources.fits_tile import (
        _make_rice_image_parser,
        write_fits_rice,
    )

    rng = np.random.RandomState(11)
    img = rng.randint(-5000, 5000, (8, 12)).astype(np.int64)
    p = str(tmp_path / "hc.fits")
    write_fits_rice(p, img, cmptype="HCOMPRESS_1", tile_rows=4)
    parse = _make_rice_image_parser()
    buf = open(p, "rb").read()
    hdr, back, heap_full = parse(buf)
    assert hdr["ZCMPTYPE"] == "HCOMPRESS_1"
    assert (back == img).all()
    assert heap_full == int(hdr["PCOUNT"])
    # ZNAME resolution: SCALE + BYTEPIX present by label
    names = {
        str(v).strip(): k for k, v in hdr.items() if k.startswith("ZNAME")
    }
    assert "SCALE" in names and "BYTEPIX" in names
    _, cut, heap_cut = parse(buf, y_range=(5, 7))
    assert (cut == img[5:7]).all()
    assert 0 < heap_cut < heap_full
