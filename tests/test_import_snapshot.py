"""CBOR snapshot import (migration path from a reference deployment).

Fixture = a tiny RIB hand-encoded in the reference's serde shape:
15 concatenated CBOR documents (src/bgprib.rs:903-948), each a
BTreeMap<NLRI-key, session → path → (ts_millis → BgpAttrEntry)> with
BgpAttrEntry {Active, Attrs, Labels} (src/bgpattrs.rs:375-391) and
addresses as octet arrays (serde non-human-readable std::net shape).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tools.import_snapshot import (
    CborDecoder,
    cbor_encode,
    import_snapshot,
    iter_snapshot_rows,
)


def _attrs(nh=(10, 0, 0, 1), aspath=(65001, 65002), comms=(0x10001,)):
    return {
        "Origin": "Igp",
        "Nexthop": {"V4": list(nh)},
        "Aspath": [{"value": a} for a in aspath],
        "Comms": [{"value": c} for c in comms],
        "LComms": [],
        "ExtComms": [],
        "Med": 100,
        "Localpref": 200,
        "Atomicaggregate": None,
        "Aggregatoras": None,
        "Originator": None,
        "Clusterlist": None,
        "PmsiTa": None,
    }


def _entry(active=True, attrs=None):
    return {"Active": active, "Attrs": attrs or _attrs(), "Labels": None}


def _v4key(a, b, c, d, plen):
    return {"addr": [a, b, c, d], "prefixlen": plen}


def _snapshot_bytes() -> bytes:
    # ipv4u: two prefixes; one has an update->withdraw history
    ipv4u = [
        (
            _v4key(10, 0, 0, 0, 24),
            {1: {0: {1704067200000: _entry(True)}}},
        ),
        (
            _v4key(10, 1, 0, 0, 16),
            {
                1: {
                    0: {
                        1704067200000: _entry(True),
                        1704067260000: _entry(False),  # withdrawn later
                    }
                }
            },
        ),
    ]
    # vpnv4u: RD 100:1, labeled
    vpnv4u = [
        (
            {
                "rd": {"rdh": 100, "rdl": 1},
                "addr": {"labels": {"labels": [30]}, "addr": _v4key(192, 168, 0, 0, 24)},
            },
            {2: {0: {1704067200000: _entry(True)}}},
        ),
    ]
    # ipv6u
    ipv6u = [
        (
            {"addr": [0x20, 0x01, 0x0D, 0xB8] + [0] * 12, "prefixlen": 32},
            {1: {0: {1704067200000: _entry(True)}}},
        ),
    ]
    tables = {
        "ipv4u": ipv4u, "vpnv4u": vpnv4u, "ipv6u": ipv6u,
    }
    order = [
        "ipv4u", "ipv4m", "ipv4lu", "vpnv4u", "vpnv4m",
        "ipv6u", "ipv6lu", "vpnv6u", "vpnv6m",
        "l2vpls", "mvpn", "evpn", "fs4u", "ipv4mdt", "ipv6mdt",
    ]
    out = b""
    for rib in order:
        pairs = tables.get(rib, [])
        # encode as a definite-length map with struct keys
        body = bytearray()
        n = len(pairs)
        if n < 24:
            body.append(0xA0 | n)
        else:
            body.append(0xB8)
            body.append(n)
        for k, v in pairs:
            body += cbor_encode(k)
            body += cbor_encode(v)
        out += bytes(body)
    return out


def test_cbor_roundtrip_codec():
    obj = {"a": [1, -2, True, None, b"\x01\x02"], "n": 1000000}
    dec = CborDecoder(cbor_encode(obj))
    assert dec.decode() == {"a": [1, -2, True, None, b"\x01\x02"], "n": 1000000}


def test_iter_snapshot_rows(tmp_path):
    f = tmp_path / "snap.cbor"
    f.write_bytes(_snapshot_bytes())
    rows = list(iter_snapshot_rows(str(f)))
    by_key = {}
    for r in rows:
        by_key.setdefault((r["rib"], r["nlri_str"]), []).append(r)
    assert ("ipv4u", "10.0.0.0/24") in by_key
    assert ("ipv6u", "2001:db8::/32") in by_key
    assert ("vpnv4u", "L30:100:1:192.168.0.0/24") in by_key
    # the withdrawn prefix has both events, ordered
    hist = by_key[("ipv4u", "10.1.0.0/16")]
    assert [h["op"] for h in hist] == ["update", "withdraw"]
    # attrs mapped
    r0 = by_key[("ipv4u", "10.0.0.0/24")][0]
    assert r0["origin"] == "IGP" and r0["med"] == 100 and r0["localpref"] == 200
    assert r0["aspath"] == [{"kind": "Seq", "asns": [65001, 65002]}]
    assert r0["comms"] == [0x10001]
    assert r0["nexthop_v4"] == (10 << 24) | 1


def test_import_snapshot_current_state_matches(spark, tmp_path):
    """Round-trip: hand-encoded reference snapshot → import →
    current_state equals the RIB the snapshot described."""
    from bgpexplorer_spark.operators.rib import current_state

    f = tmp_path / "snap.cbor"
    f.write_bytes(_snapshot_bytes())
    hist = import_snapshot(spark, str(f), str(tmp_path / "hist"))
    cur = current_state(hist, only_active=False)
    active = {
        (r.rib, r.nlri_str)
        for r in cur.filter(F.col("active")).collect()
    }
    assert active == {
        ("ipv4u", "10.0.0.0/24"),
        ("vpnv4u", "L30:100:1:192.168.0.0/24"),
        ("ipv6u", "2001:db8::/32"),
    }
    # the withdrawn route's tombstone is present but inactive
    gone = cur.filter(F.col("nlri_str") == "10.1.0.0/16").collect()
    assert len(gone) == 1 and not gone[0].active
