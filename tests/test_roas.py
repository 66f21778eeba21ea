"""ROA export loaders (sources/roas.py): the public validator
interchange shapes -> the rpki_validate dimension tables, end-to-end
through RFC 6811 classification."""

from __future__ import annotations

import json

import pytest

from bgpexplorer_spark.sources.roas import load_roas_csv, load_roas_json

ROAS = [
    {"asn": "AS100", "prefix": "10.0.0.0/16", "maxLength": 24, "ta": "ripe"},
    {"asn": 200, "prefix": "10.1.0.0/16", "ta": "arin"},            # no maxLength
    {"asn": "AS65000", "prefix": "2001:db8::/32", "maxLength": 48, "ta": "apnic"},
]
BAD = [
    {"asn": "ASX", "prefix": "10.2.0.0/16"},          # bad asn
    {"asn": "AS1", "prefix": "10.2.0.0/99"},          # bad prefix
    {"asn": "AS1", "prefix": "10.2.0.0/24", "maxLength": 8},  # max < plen
]


def test_load_roas_json_and_validate(spark, tmp_path):
    p = tmp_path / "export.json"
    p.write_text(json.dumps({"roas": ROAS + BAD}))
    with pytest.warns(UserWarning, match="skipped 3"):
        v4, v6 = load_roas_json(spark, str(p))
    rows = {(r.net, r.plen): r for r in v4.collect()}
    assert rows[(10 << 24, 16)].max_len == 24
    assert rows[(10 << 24, 16)].asn == 100 and rows[(10 << 24, 16)].ta == "ripe"
    # absent maxLength defaults to plen (RFC 6482 3.3)
    assert rows[((10 << 24) | (1 << 16), 16)].max_len == 16
    (r6,) = v6.collect()
    assert r6.net == bytes.fromhex("20010db8" + "0" * 24)
    assert (r6.plen, r6.max_len, r6.asn) == (32, 48, 65000)

    # end-to-end RFC 6811 against the loaded table
    from bgpexplorer_spark.operators.analytics import rpki_validate

    routes = spark.createDataFrame(
        [
            (10 << 24, 24, 100),            # 10.0.0.0/24 by AS100: Valid
            (10 << 24, 25, 100),            # /25 beyond maxLength: Invalid
            ((10 << 24) | (1 << 16), 16, 999),  # wrong origin: Invalid
            (11 << 24, 16, 100),            # no covering ROA: NotFound
        ],
        "addr_v4 long, prefixlen int, origin_as long",
    )
    got = {(r.addr_v4, r.prefixlen): r.validity
           for r in rpki_validate(routes, v4).collect()}
    assert got == {
        (10 << 24, 24): "Valid",
        (10 << 24, 25): "Invalid",
        ((10 << 24) | (1 << 16), 16): "Invalid",
        (11 << 24, 16): "NotFound",
    }


def test_load_roas_csv(spark, tmp_path):
    p = tmp_path / "vrps.csv"
    p.write_text(
        "ASN,IP Prefix,Max Length,Trust Anchor\n"
        "AS100,10.0.0.0/16,24,ripe\n"
        "AS200,10.1.0.0/16,,arin\n"
        "AS65000,2001:db8::/32,48,apnic\n"
        "garbage,not-a-prefix,x,y\n"
    )
    with pytest.warns(UserWarning, match="skipped 1"):
        v4, v6 = load_roas_csv(spark, str(p))
    assert v4.count() == 2 and v6.count() == 1
    rows = {r.asn: r for r in v4.collect()}
    assert rows[200].max_len == 16      # blank Max Length -> plen
    assert rows[100].ta == "ripe"


def test_csv_missing_column_raises(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("foo,bar\n1,2\n")
    with pytest.raises(ValueError, match="missing CSV column"):
        load_roas_csv(spark, str(p))


# --- Hypothesis sweep: skip-don't-crash over arbitrary malformed rows -------
# (the byte-flip discipline bmp.py got, applied to the validator-export
# loaders: wrong types, missing keys, garbage prefixes, out-of-range
# maxLength must SKIP — valid rows always survive, nothing raises.)

from hypothesis import given, settings, strategies as st

from bgpexplorer_spark.sources.roas import _roa_row


def _mk_valid(draw):
    v6 = draw(st.booleans())
    width = 128 if v6 else 32
    plen = draw(st.integers(0, width))
    addr = draw(st.integers(0, 2**width - 1))
    import ipaddress as _ip

    # explicit family: ip_network((int, plen)) guesses v4 for small ints
    net = (_ip.IPv6Network if v6 else _ip.IPv4Network)(
        (addr, plen), strict=False
    )
    asn = draw(st.integers(0, 2**32 - 1))
    asn_raw = draw(st.sampled_from([asn, f"AS{asn}", f"as{asn}", str(asn)]))
    maxlen = draw(st.one_of(st.none(), st.integers(plen, width)))
    ta = draw(st.one_of(st.none(), st.text(max_size=8)))
    return {
        "asn": asn_raw, "prefix": str(net),
        "maxLength": maxlen, "ta": ta,
        "_expect": (v6, asn, net.prefixlen,
                    maxlen if maxlen is not None else net.prefixlen),
    }


_garbage_scalar = st.one_of(
    st.none(), st.booleans(), st.integers(-2**70, 2**70),
    st.floats(allow_nan=True), st.text(max_size=20),
    st.binary(max_size=8).map(lambda b: b.decode("latin1")),
)
_garbage_row = st.fixed_dictionaries(
    {},
    optional={
        "asn": _garbage_scalar, "prefix": _garbage_scalar,
        "maxLength": _garbage_scalar, "ta": _garbage_scalar,
    },
)
_valid_row = st.builds(lambda: None).flatmap(
    lambda _: st.composite(lambda draw: _mk_valid(draw))()
)


@settings(max_examples=150, deadline=None)
@given(row=st.one_of(_garbage_row, _valid_row))
def test_roa_row_never_raises_and_keeps_valid(row):
    expect = row.pop("_expect", None) if isinstance(row, dict) else None
    out = _roa_row(
        row.get("asn"), row.get("prefix"), row.get("maxLength"), row.get("ta")
    )
    if expect is not None:
        v6, asn, plen, maxlen = expect
        assert out is not None
        assert out[0] == v6 and out[2] == plen and out[3] == maxlen
        assert out[4] == asn
    elif out is not None:
        # whatever survives garbage must satisfy the table invariants
        is_v6, net, plen, max_len, asn, ta = out
        width = 128 if is_v6 else 32
        assert 0 <= plen <= max_len <= width
        assert 0 <= asn < 2**32


@settings(max_examples=12, deadline=None)
@given(
    data=st.lists(st.one_of(_garbage_row, _valid_row, _garbage_scalar),
                  max_size=12),
    fmt=st.sampled_from(["json", "csv"]),
)
def test_roa_loaders_skip_dont_crash(spark, tmp_path_factory, data, fmt):
    """Whole-file sweep through the REAL loaders: arbitrary row soup
    parses without raising, every definitely-valid row lands in the
    right family table."""
    import csv as _csv

    tmp = tmp_path_factory.mktemp("roas")
    rows = []
    n_valid_v4 = n_valid_v6 = 0
    for r in data:
        if isinstance(r, dict) and "_expect" in r:
            exp = r.pop("_expect")
            if exp[0]:
                n_valid_v6 += 1
            else:
                n_valid_v4 += 1
        rows.append(r)
    if fmt == "json":
        path = tmp / "r.json"
        path.write_text(json.dumps({"roas": rows}, default=str))
        v4, v6 = load_roas_json(spark, str(path))
    else:
        path = tmp / "r.csv"
        with open(path, "w", newline="") as f:
            w = _csv.writer(f)
            w.writerow(["ASN", "IP Prefix", "Max Length", "Trust Anchor"])
            for r in rows:
                if isinstance(r, dict):
                    w.writerow([
                        r.get("asn", ""), r.get("prefix", ""),
                        "" if r.get("maxLength") is None else r.get("maxLength"),
                        r.get("ta", ""),
                    ])
                else:
                    w.writerow([r])
        v4, v6 = load_roas_csv(spark, str(path))
    assert v4.count() >= n_valid_v4 and v6.count() >= n_valid_v6
