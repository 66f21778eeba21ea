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
