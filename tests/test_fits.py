"""Unit tests for the stdlib FITS BINTABLE writer/parser: scaled
columns (TSCAL/TZERO), multi-HDU walking, extended TFORM codes, and
bounds-checked header parsing (pure-Python assertions — no Spark
needed except the round-trip test at the end)."""

from __future__ import annotations

import os
import tempfile

import pytest

from lsd_spark.sources.fits import (
    _make_fits_parser,
    write_fits_bintable,
)


def _write(tmpdir, **kw):
    path = os.path.join(tmpdir, "t.fits")
    write_fits_bintable(
        path,
        ["k", "name", "u16", "scaled", "w32", "flag"],
        ["K", "6A", "I", "J", "E", "L"],
        [
            [0, 1, 2],
            ["aa", "bb", "cc"],
            [40000, 40001, 65535],
            [0.25, -1.5, 12.75],
            [0.5, 1.5, 2.5],
            [True, False, True],
        ],
        scales={"u16": (1.0, 32768.0), "scaled": (0.25, 0.0)},
        **kw,
    )
    return path


def test_scaled_and_extended_tform_roundtrip(tmp_path):
    path = _write(str(tmp_path))
    _, find_bintable, table_fields, parse_table = _make_fits_parser()
    buf = open(path, "rb").read()
    hdr, _ = find_bintable(buf)
    fields, cols = parse_table(buf)
    styps = {n: s for n, _d, s, _sc, _z in fields}
    # unsigned-int convention stays integral; 0.25-scaled promotes
    assert styps == {
        "k": "bigint", "name": "string", "u16": "bigint",
        "scaled": "double", "w32": "double", "flag": "boolean",
    }
    assert list(cols["k"]) == [0, 1, 2]
    assert cols["name"] == ["aa", "bb", "cc"]
    assert list(cols["u16"]) == [40000, 40001, 65535]  # raw+32768, exact
    assert list(cols["scaled"]) == [0.25, -1.5, 12.75]  # exact multiples of 1/4
    assert list(cols["w32"]) == [0.5, 1.5, 2.5]
    assert cols["flag"] == [True, False, True]


def test_multi_hdu_walk_skips_leading_image(tmp_path):
    path = _write(str(tmp_path), leading_image_hdu=True)
    _, find_bintable, _tf, parse_table = _make_fits_parser()
    buf = open(path, "rb").read()
    hdr, _ = find_bintable(buf)
    assert hdr["XTENSION"].startswith("BINTABLE") and int(hdr["NAXIS2"]) == 3
    _, cols = parse_table(buf, wanted=["k", "u16"])
    assert set(cols) == {"k", "u16"} and list(cols["u16"]) == [40000, 40001, 65535]


def test_truncated_header_raises(tmp_path):
    path = _write(str(tmp_path))
    buf = open(path, "rb").read()
    read_cards, find_bintable, _tf, _pt = _make_fits_parser()
    # header cut mid-block: must raise, not spin forever
    with pytest.raises(ValueError, match="truncated"):
        read_cards(buf[:1000], 0)
    # no BINTABLE in range: primary header only
    with pytest.raises(ValueError):
        find_bintable(buf[:2880])


def test_non_fits_garbage_raises():
    read_cards, find_bintable, _tf, _pt = _make_fits_parser()
    with pytest.raises(ValueError):
        find_bintable(b"\x00" * 10 * 2880)


def test_writer_stores_unsigned_raw_as_int16(tmp_path):
    """Unsigned-int convention edges: physical 0..65535 stores as raw
    int16 -32768..32767; the round trip must be exact at both ends."""
    path = os.path.join(str(tmp_path), "edge.fits")
    vals = [0, 1, 32767, 32768, 65535]
    write_fits_bintable(
        path, ["v"], ["I"], [vals], scales={"v": (1.0, 32768.0)}
    )
    _rc, _fb, _tf, parse_table = _make_fits_parser()
    _, cols = parse_table(open(path, "rb").read())
    assert list(cols["v"]) == vals


def test_spark_roundtrip_scaled(spark):
    """End-to-end through the distributed read path at fixture scale."""
    from lsd_spark.sources.fits import read_fits

    d = tempfile.mkdtemp(prefix="lsd_fits_test_")
    path = os.path.join(d, "x.fits")
    write_fits_bintable(
        path,
        ["k", "s"],
        ["K", "J"],
        [[1, 2, 3], [2.5, 5.0, -7.5]],
        scales={"s": (2.5, 0.0)},
        leading_image_hdu=True,
    )
    got = read_fits(spark, d).orderBy("k").collect()
    assert [(r.k, r.s) for r in got] == [(1, 2.5), (2, 5.0), (3, -7.5)]


def test_header_map_rides_along_and_answers_keywords(spark):
    """with_header=True carries the BINTABLE cards as a per-file
    map<string,string> (the ffitskw surface): every row of a file
    shares one map, and the physical layout keywords answer
    correctly from the parsed bytes."""
    from lsd_spark.sources.fits import read_fits

    d = tempfile.mkdtemp(prefix="lsd_fits_hdr_")
    path = os.path.join(d, "x.fits")
    write_fits_bintable(path, ["k", "v"], ["K", "D"], [[1, 2, 3], [0.5, 1.5, 2.5]])
    got = read_fits(spark, d, with_header=True).orderBy("k").collect()
    assert len(got) == 3
    for r in got:
        assert r._hdr["NAXIS2"] == "3"
        assert r._hdr["NAXIS1"] == "16"  # 8(K) + 8(D)
        assert r._hdr["TTYPE1"] == "k" and r._hdr["TFORM2"] == "D"
    # header column is pruned when untouched (payload-size guard)
    df = read_fits(spark, d, with_header=True).select("k")
    assert "_hdr" not in df.columns


# --- IMAGE HDU pixel data (round-10) ----------------------------------------


def test_image_roundtrip_unsigned_and_float_ext(tmp_path):
    import numpy as np

    from lsd_spark.sources.fits import _make_image_parser, write_fits_image

    _, _, parse_images = _make_image_parser()
    phys = (np.arange(24, dtype=np.int64) * 2731 % 65536).reshape(4, 6)
    f32 = (phys / 4.0).astype(np.float64)
    p = str(tmp_path / "x.fits")
    write_fits_image(p, phys, f32=f32, extra_cards={"NATKEY": 7})
    hdus = parse_images(open(p, "rb").read())
    assert len(hdus) == 2
    (h0, a0), (h1, a1) = hdus
    assert h0["NATKEY"] == "7"
    assert int(h0["BITPIX"]) == 16 and int(h1["BITPIX"]) == -32
    assert a0.shape == (4, 6) and a1.shape == (4, 6)
    assert (a0 == phys).all()  # BZERO applied exactly (full u16 range)
    assert (a1 == f32).all()  # quarter-integers are float32-exact


def test_image_parser_handles_bscale_and_f64(tmp_path):
    """Decoder generality beyond our writer: a handcrafted BITPIX=-64
    image and a BSCALE!=1 integer image must decode per the public
    scaling rule physical = BZERO + BSCALE*stored."""
    import numpy as np

    from lsd_spark.sources.fits import (
        _card,
        _card_float,
        _header,
        _make_image_parser,
        _pad,
    )

    _, _, parse_images = _make_image_parser()
    vals = np.linspace(-3.5, 9.25, 12).reshape(3, 4)
    buf = _header(
        [
            _card("SIMPLE", True),
            _card("BITPIX", -64),
            _card("NAXIS", 2),
            _card("NAXIS1", 4),
            _card("NAXIS2", 3),
        ]
    ) + _pad(vals.astype(">f8").tobytes())
    stored = np.arange(6, dtype=np.int64).reshape(2, 3)
    buf += _header(
        [
            _card("XTENSION", "IMAGE"),
            _card("BITPIX", 32),
            _card("NAXIS", 2),
            _card("NAXIS1", 3),
            _card("NAXIS2", 2),
            _card("PCOUNT", 0),
            _card("GCOUNT", 1),
            _card_float("BSCALE", 2.5),
            _card_float("BZERO", -10.0),
        ]
    ) + _pad(stored.astype(">i4").tobytes())
    hdus = parse_images(bytes(buf))
    assert (hdus[0][1] == vals).all()
    assert (hdus[1][1] == -10.0 + 2.5 * stored).all()


def test_image_parser_rejects_malformed(tmp_path):
    import numpy as np

    from lsd_spark.sources.fits import _make_image_parser, write_fits_image

    _, _, parse_images = _make_image_parser()
    p = str(tmp_path / "x.fits")
    write_fits_image(p, np.zeros((4, 4), np.int64))
    good = open(p, "rb").read()
    with pytest.raises(ValueError, match="no END card"):
        parse_images(good[:100])
    with pytest.raises(ValueError, match="no 2-D image"):
        # header-only file: primary with NAXIS=0
        from lsd_spark.sources.fits import _card, _header

        parse_images(
            bytes(_header([_card("SIMPLE", True), _card("BITPIX", 8), _card("NAXIS", 0)]))
        )


def test_wcs_pix2sky_matches_independent_numpy(spark):
    """source_fits_wcs's Catalyst TAN de-projection must agree with
    an independent numpy implementation of the same public formulas
    (Greisen & Calabretta 2002) for every (exposure, probe pixel),
    and the sky->pix roundtrip residual must quantize to exactly 0
    (a wrong CD sign / swapped axis blows it past the 1e-6 grid)."""
    import math

    import numpy as np

    from lsd_spark.registry import QUERIES, load_all
    from lsd_spark.sources.fits import wcs_cards
    from tests.conftest import SF_DIR

    load_all()
    rows = QUERIES["source_fits_wcs"](spark, SF_DIR).collect()
    assert len(rows) == 125  # 25 exposures x 5 probe pixels
    for r in rows:
        w = wcs_cards(r["natkey"])
        xi = math.radians(
            w["CD1_1"] * (r["px"] - w["CRPIX1"])
            + w["CD1_2"] * (r["py"] - w["CRPIX2"])
        )
        eta = math.radians(
            w["CD2_1"] * (r["px"] - w["CRPIX1"])
            + w["CD2_2"] * (r["py"] - w["CRPIX2"])
        )
        d0 = math.radians(w["CRVAL2"])
        r0 = math.radians(w["CRVAL1"])
        den = math.cos(d0) - eta * math.sin(d0)
        ra = math.degrees(r0 + math.atan2(xi, den)) % 360.0
        dec = math.degrees(
            math.atan((math.sin(d0) + eta * math.cos(d0)) / math.hypot(xi, den))
        )
        assert abs(r["ra"] - ra) < 2e-6, (r, ra)
        assert abs(r["dec"] - dec) < 2e-6, (r, dec)
        assert r["roundtrip_err"] == 0.0, r
    # off-axis pixels genuinely move (the CD rotation matters): the
    # four corners of exposure 7 land at four distinct positions
    corners = {
        (r["ra"], r["dec"])
        for r in rows
        if r["natkey"] == 7 and (r["px"], r["py"]) != (4, 5)
    }
    assert len(corners) == 4


def test_wcs_header_cards_survive_repr_roundtrip(tmp_path):
    """The WCS floats written via _card_float(repr) must parse back
    bit-identically — the oracle depends on it."""
    import numpy as np

    from lsd_spark.sources.fits import (
        _make_image_parser,
        wcs_cards,
        write_fits_image,
    )

    p = str(tmp_path / "w.fits")
    cards = {"NATKEY": 13}
    cards.update(wcs_cards(13))
    write_fits_image(p, np.zeros((8, 8), dtype=np.int64), extra_cards=cards)
    _, _, parse_images = _make_image_parser()
    hdr, _arr = parse_images(open(p, "rb").read())[0]
    for k, v in wcs_cards(13).items():
        if isinstance(v, float):
            assert float(hdr[k]) == v, (k, hdr[k], v)
        else:
            assert hdr[k].startswith(v.split("-")[0]), (k, hdr[k])


def test_fuzz_corrupted_files_raise_valueerror_only(tmp_path):
    """Corruption fuzz over all three parser families (plain image,
    RICE/ZIMAGE, BINTABLE): byte flips, truncations, random splices
    and header-area flips must either parse or raise ValueError —
    never KeyError/struct.error/IndexError leaking parser internals,
    and never hang (the round-10 fuzz found KeyError on flipped
    mandatory-card names)."""
    import numpy as np

    from lsd_spark.sources.fits import (
        _make_fits_parser,
        _make_image_parser,
        write_fits_bintable,
        write_fits_image,
    )
    from lsd_spark.sources.fits_tile import (
        _make_rice_image_parser,
        write_fits_rice,
    )

    img = np.arange(64).reshape(8, 8) * 13 + 1000
    p1 = str(tmp_path / "a.fits")
    write_fits_image(p1, img, f32=img / 4.0, extra_cards={"NATKEY": 3})
    p2 = str(tmp_path / "b.fits")
    write_fits_rice(p2, img - 32768, extra_cards={"NATKEY": 3})
    p3 = str(tmp_path / "c.fits")
    write_fits_bintable(
        p3, ["k", "v"], ["J", "D"], [np.arange(10), np.arange(10) * 1.5]
    )
    _, _, parse_images = _make_image_parser()
    parse_rice = _make_rice_image_parser()
    _, _, _, parse_table = _make_fits_parser()
    parsers = [
        (open(p1, "rb").read(), parse_images),
        (open(p2, "rb").read(), parse_rice),
        (open(p3, "rb").read(), parse_table),
    ]
    rng = np.random.RandomState(0)
    raised = 0
    for trial in range(900):
        base, parse = parsers[trial % 3]
        buf = bytearray(base)
        k = trial % 4
        if k == 0:
            i = rng.randint(len(buf))
            buf[i] ^= 1 << rng.randint(8)
        elif k == 1:
            buf = buf[: rng.randint(1, len(buf))]
        elif k == 2:
            i = rng.randint(len(buf))
            j = rng.randint(1, 64)
            buf[i : i + j] = bytes(rng.randint(0, 256, j, dtype=np.uint8))
        else:
            i = rng.randint(min(5760, len(buf)))
            buf[i] ^= 0xFF
        try:
            parse(bytes(buf))
        except ValueError:
            raised += 1
        # any other exception type propagates and fails the test
    assert raised > 100  # the fuzz actually exercised failure paths


def test_survey_ingest_conserves_detections(spark):
    """Every detection lands in exactly one HEALPix pixel: the
    coverage map's counts and flux must sum to the input totals
    (25 exposures x 8 detections; flux closed form)."""
    from lsd_spark.registry import QUERIES, load_all
    from tests.conftest import SF_DIR

    load_all()
    rows = QUERIES["pipeline_survey_ingest"](spark, SF_DIR).collect()
    assert sum(r["n_det"] for r in rows) == 200
    expected_flux = sum(
        100 + (7 * d + k) % 50 for k in range(25) for d in range(8)
    )
    assert sum(r["flux_sum"] for r in rows) == expected_flux
    # coverage is genuinely spread (many exposures -> many pixels),
    # and every pixel id is a valid nside=16 RING index
    assert len(rows) >= 20
    assert all(0 <= r["hpx"] < 12 * 16 * 16 for r in rows)


def test_wcs_sin_pix2sky_matches_independent_numpy(spark):
    """source_fits_wcs_sin's orthographic de-projection must agree
    with an independent numpy implementation AND must genuinely
    differ from TAN math on the same headers (the wide 0.5 deg/px
    field puts the corner probes ~2.4e-3 deg apart between the two
    projections — 2400x the 1e-6 oracle grid), proving the CTYPE
    dispatch is load-bearing."""
    import math

    from lsd_spark.registry import QUERIES, load_all
    from lsd_spark.sources.fits import wcs_cards
    from tests.conftest import SF_DIR

    load_all()
    rows = QUERIES["source_fits_wcs_sin"](spark, SF_DIR).collect()
    assert len(rows) == 125
    max_tan_gap = 0.0
    for r in rows:
        w = wcs_cards(r["natkey"])
        x = math.radians(
            500.0 * w["CD1_1"] * (r["px"] - w["CRPIX1"])
            + 500.0 * w["CD1_2"] * (r["py"] - w["CRPIX2"])
        )
        y = math.radians(
            500.0 * w["CD2_1"] * (r["px"] - w["CRPIX1"])
            + 500.0 * w["CD2_2"] * (r["py"] - w["CRPIX2"])
        )
        d0 = math.radians(w["CRVAL2"])
        r0 = math.radians(w["CRVAL1"])
        z = math.sqrt(1.0 - x * x - y * y)
        ra = math.degrees(
            r0 + math.atan2(x, z * math.cos(d0) - y * math.sin(d0))
        ) % 360.0
        dec = math.degrees(math.asin(z * math.sin(d0) + y * math.cos(d0)))
        assert abs(r["ra"] - ra) < 2e-6, (r, ra)
        assert abs(r["dec"] - dec) < 2e-6, (r, dec)
        assert r["roundtrip_err"] == 0.0, r
        # TAN math on the same intermediate coords
        den = math.cos(d0) - y * math.sin(d0)
        dec_tan = math.degrees(
            math.atan((math.sin(d0) + y * math.cos(d0)) / math.hypot(x, den))
        )
        max_tan_gap = max(max_tan_gap, abs(dec_tan - dec))
    assert max_tan_gap > 1e-4, max_tan_gap  # projections distinguishable


def test_source_fits_gzip_matches_closed_form(spark):
    from lsd_spark.registry import QUERIES, load_all
    from tests.conftest import SF_DIR

    load_all()
    rows = QUERIES["source_fits_gzip"](spark, SF_DIR).collect()
    assert len(rows) == 25
    for r in rows:
        k = r["natkey"]
        assert r["n_tiles"] == 2  # ZTILE2=4 over 8 rows
        assert r["px_sum"] == 16448 * k + 2912
        assert r["px_min"] == 257 * k
        assert r["px_max"] == 257 * k + 91
        assert r["compressed_smaller"] is True


def test_wcs_sip_distortion_is_load_bearing(spark):
    """source_fits_wcs_sip: the de-projection must match an
    independent numpy evaluation of the SIP polynomial + TAN
    formulas, corners must carry non-zero distortion (dist_px), and
    the distorted solution must differ from plain TAN by much more
    than the 1e-6 grid — dropping the polynomial breaks the hash."""
    import math

    from lsd_spark.registry import QUERIES, load_all
    from lsd_spark.sources.fits import wcs_cards
    from tests.conftest import SF_DIR

    load_all()
    rows = QUERIES["source_fits_wcs_sip"](spark, SF_DIR).collect()
    assert len(rows) == 125
    gap = 0.0
    for r in rows:
        k = r["natkey"]
        w = wcs_cards(k)
        u, v = r["px"] - w["CRPIX1"], r["py"] - w["CRPIX2"]
        du = (
            0.001 * (1 + k % 3) * u * u
            + 0.0005 * (k % 4) * u * v
            + 0.001 * (1 + k % 2) * v * v
        )
        dv = (
            0.0005 * (1 + k % 4) * u * u
            + 0.001 * (k % 3) * u * v
            + 0.0005 * (1 + k % 5) * v * v
        )
        assert abs(r["dist_px"] - max(abs(du), abs(dv))) < 2e-6
        xi = math.radians(w["CD1_1"] * (u + du) + w["CD1_2"] * (v + dv))
        eta = math.radians(w["CD2_1"] * (u + du) + w["CD2_2"] * (v + dv))
        d0, r0 = math.radians(w["CRVAL2"]), math.radians(w["CRVAL1"])
        den = math.cos(d0) - eta * math.sin(d0)
        ra = math.degrees(r0 + math.atan2(xi, den)) % 360.0
        dec = math.degrees(
            math.atan(
                (math.sin(d0) + eta * math.cos(d0)) / math.hypot(xi, den)
            )
        )
        assert abs(r["ra"] - ra) < 2e-6 and abs(r["dec"] - dec) < 2e-6
        # undistorted TAN on the same header
        xi0 = math.radians(w["CD1_1"] * u + w["CD1_2"] * v)
        eta0 = math.radians(w["CD2_1"] * u + w["CD2_2"] * v)
        den0 = math.cos(d0) - eta0 * math.sin(d0)
        dec0 = math.degrees(
            math.atan(
                (math.sin(d0) + eta0 * math.cos(d0)) / math.hypot(xi0, den0)
            )
        )
        gap = max(gap, abs(dec0 - dec))
        if (r["px"], r["py"]) != (4, 5):
            assert r["dist_px"] > 0.0, r
    assert gap > 1e-5, gap


def test_wcs_arc_zea_match_numpy_and_separate_from_each_other(spark):
    """Round-12 zenithal breadth: ARC and ZEA must each agree with an
    independent numpy implementation, round-trip to zero residual,
    and all four zenithal projections (TAN/SIN/ARC/ZEA) must be
    pairwise oracle-distinguishable on the wide field (the
    [[numeric-traps]] separation-scale rule: smallest pair gap ARC vs
    ZEA ~ z^3/24 ~ 2e-4 deg at the corners, >=100x the 1e-6 grid)."""
    import math

    from lsd_spark.registry import QUERIES, load_all
    from lsd_spark.sources.fits import wcs_cards
    from tests.conftest import SF_DIR

    load_all()

    def sky_of(code, x, y, r0, d0):
        rho = math.hypot(x, y)
        if code == "ARC":
            sc = math.sin(rho) / rho if rho else 1.0
            zeta = math.cos(rho)
        elif code == "ZEA":
            sc = math.sqrt(1.0 - rho * rho / 4.0)
            zeta = 1.0 - rho * rho / 2.0
        elif code == "SIN":
            sc, zeta = 1.0, math.sqrt(1.0 - rho * rho)
        else:  # TAN
            sc = 1.0 / math.sqrt(1.0 + rho * rho)
            zeta = sc
        dec = math.asin(zeta * math.sin(d0) + y * sc * math.cos(d0))
        ra = r0 + math.atan2(
            x * sc, zeta * math.cos(d0) - y * sc * math.sin(d0)
        )
        return ra, dec

    def ang_gap(a, b):
        # full angular separation in degrees (the dec component alone
        # vanishes for roll angles that put the radial shift along RA)
        (ra1, d1), (ra2, d2) = a, b
        s = math.sin((d1 - d2) / 2) ** 2 + math.cos(d1) * math.cos(
            d2
        ) * math.sin((ra1 - ra2) / 2) ** 2
        return math.degrees(2 * math.asin(min(1.0, math.sqrt(s))))

    min_pair_gap = float("inf")
    for code in ("ARC", "ZEA"):
        rows = QUERIES[f"source_fits_wcs_{code.lower()}"](
            spark, SF_DIR
        ).collect()
        assert len(rows) == 125
        for r in rows:
            w = wcs_cards(r["natkey"])
            x = math.radians(
                500.0 * w["CD1_1"] * (r["px"] - w["CRPIX1"])
                + 500.0 * w["CD1_2"] * (r["py"] - w["CRPIX2"])
            )
            y = math.radians(
                500.0 * w["CD2_1"] * (r["px"] - w["CRPIX1"])
                + 500.0 * w["CD2_2"] * (r["py"] - w["CRPIX2"])
            )
            d0 = math.radians(w["CRVAL2"])
            r0 = math.radians(w["CRVAL1"])
            rho = math.hypot(x, y)
            if code == "ARC":
                sc = math.sin(rho) / rho if rho else 1.0
                zeta = math.cos(rho)
            else:
                sc = math.sqrt(1.0 - rho * rho / 4.0)
                zeta = 1.0 - rho * rho / 2.0
            ra = math.degrees(
                r0
                + math.atan2(
                    x * sc, zeta * math.cos(d0) - y * sc * math.sin(d0)
                )
            ) % 360.0
            dec = math.degrees(
                math.asin(zeta * math.sin(d0) + y * sc * math.cos(d0))
            )
            assert abs(r["ra"] - ra) < 2e-6, (code, r, ra)
            assert abs(r["dec"] - dec) < 2e-6, (code, r, dec)
            assert r["roundtrip_err"] == 0.0, (code, r)
            # pairwise separation at the corner probes
            if (r["px"], r["py"]) in ((1, 1), (8, 8)):
                sky = {
                    c: sky_of(c, x, y, r0, d0)
                    for c in ("TAN", "SIN", "ARC", "ZEA")
                }
                codes = list(sky)
                for i, a in enumerate(codes):
                    for b in codes[i + 1:]:
                        min_pair_gap = min(
                            min_pair_gap, ang_gap(sky[a], sky[b])
                        )
    assert min_pair_gap > 1e-4, min_pair_gap
