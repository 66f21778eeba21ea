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


def test_export_import_roundtrip(spark, tmp_path):
    """The reverse migration path (tools/export_snapshot): engine
    history → reference CBOR shape → import → identical history on
    every field both directions carry, including RD+label keys, mixed
    Seq/Set paths, large communities, the PMSI tunnel attribute, and a
    withdraw tombstone. The mvpn route must be SKIPPED (non-prefix key),
    not lossily emitted."""
    from pyspark.sql import functions as F

    from bgpexplorer_spark.operators.ingest import build_history
    from tests.ribdata import make_updates, u
    from tools.export_snapshot import export_snapshot

    rows = [
        u("10.0.0.0/24", t=0, session_id=1,
          aspath=[("Seq", [65001, 65002])], comms=[0x10001],
          nexthop="10.0.0.1", med=100, localpref=200,
          lcomms=[(10, 20, 30)],
          # Option<IpAddr> attrs in the reference (src/bgpattrs.rs:30-33):
          # must export as {"V4": [octets]}, not bool/uint, or the file
          # is unloadable by a reference deployment
          atomicaggregate=True,
          originator=(192 << 24) | (0 << 16) | (2 << 8) | 1,
          extcomms=[(0, 2, 200, 300), (1, 2, 0x0A000001, 77)],
          aggregator_as=65010,
          pmsi_ta={"flags": 1, "tunnel_type": 6, "label": 3000,
                   "tunnel_id": b"\xc0\x00\x02\x01"}),
        u("10.0.0.0/24", t=60, session_id=1, op="withdraw"),
        u("192.168.0.0/24", rib="vpnv4u", rd="100:1", labels=[30], t=0,
          session_id=2, nexthop="10.0.0.2",
          aspath=[("Set", [200, 300]), ("Seq", [65001])]),
        u("2001:db8::/32", rib="ipv6u", t=0, session_id=1,
          nexthop="2001:db8::1", aspath=[("Seq", [65001])]),
        u("10.9.0.0/32", rib="mvpn", rd="1:1", t=0,
          mvpn=(5, "10.9.0.1", "232.0.0.1")),
    ]
    hist = build_history(make_updates(spark, rows))
    snap = tmp_path / "snap.cbor"
    counts = export_snapshot(hist, str(snap))
    assert "mvpn" not in counts and counts["ipv4u"] == 2

    # the at-rest bytes must carry the strict serde Option<IpAddr> enum
    # shape (not the legacy bool/uint the import also tolerates) — a
    # reference deployment rejects anything else
    dec = CborDecoder(snap.read_bytes())
    ipv4u_tbl = dec.decode()
    (wire_attrs,) = {
        str(k): v for k, v in ipv4u_tbl.items()
    }.values()  # one prefix in ipv4u
    first_entry = next(iter(next(iter(next(iter(
        wire_attrs.values())).values())).values()))
    assert first_entry["Attrs"]["Atomicaggregate"] == {"V4": [0, 0, 0, 0]}
    assert first_entry["Attrs"]["Originator"] == {"V4": [192, 0, 2, 1]}
    # BgpExtCommunity {ctype, subtype, a, b} seq + BgpAggregatorAS
    # {asn, addr} — the zettabgp shapes a reference deployment decodes
    assert first_entry["Attrs"]["ExtComms"] == [
        {"ctype": 0, "subtype": 2, "a": 200, "b": 300},
        {"ctype": 1, "subtype": 2, "a": 0x0A000001, "b": 77},
    ]
    assert first_entry["Attrs"]["Aggregatoras"] == {
        "asn": 65010, "addr": [0, 0, 0, 0]
    }
    # ciborium-strict: every one of the reference's 13 BgpAttrs fields
    # must be PRESENT in declaration order (its deserializer errors on a
    # missing field, src/bgpattrs.rs:279-298 missing_field)
    assert list(first_entry["Attrs"].keys()) == [
        "Origin", "Nexthop", "Aspath", "Comms", "LComms", "ExtComms",
        "Med", "Localpref", "Atomicaggregate", "Aggregatoras",
        "Originator", "Clusterlist", "PmsiTa",
    ]

    hist2 = import_snapshot(spark, str(snap))

    cols = [
        "rib", "nlri_str", "rd_hi", "rd_lo", "addr_v4", "addr_v6",
        "prefixlen", "labels", "session_id", "path_id", "ts", "active",
        "origin", "nexthop_v4", "nexthop_v6", "aspath", "comms",
        "lcomms", "extcomms", "med", "localpref", "atomicaggregate",
        "aggregator_as", "originator", "pmsi_ta",
    ]
    orig = sorted(
        map(repr, hist.filter(F.col("rib") != "mvpn").select(cols).collect())
    )
    back = sorted(map(repr, hist2.select(cols).collect()))
    assert back == orig


def test_export_import_roundtrip_randomized(spark, tmp_path):
    """Fuzz the CBOR migration path (the r05 high-severity area): 120
    random rows over every prefix-shaped family with random attr
    presence — v4/v6/VPN/labeled keys, Seq/Set paths, all three
    community kinds, med/localpref, atomic-aggregate, originator,
    cluster list, PMSI, withdraw tombstones — must survive
    export_snapshot -> import_snapshot exactly on every field both
    directions carry."""
    import random

    from pyspark.sql import functions as F

    from bgpexplorer_spark.operators.ingest import build_history
    from tests.ribdata import make_updates, u
    from tools.export_snapshot import export_snapshot

    rng = random.Random(20260814)
    fams = ["ipv4u", "ipv6u", "vpnv4u", "ipv4lu", "vpnv6u"]
    rows = []
    for i in range(120):
        fam = fams[rng.randrange(len(fams))]
        v6 = fam.startswith("ipv6") or fam.startswith("vpnv6")
        if v6:
            plen = rng.randint(1, 64)
            raw = rng.getrandbits(128) & (((1 << plen) - 1) << (128 - plen))
            import ipaddress
            nlri = f"{ipaddress.IPv6Address(raw.to_bytes(16, 'big'))}/{plen}"
        else:
            plen = rng.randint(1, 32)
            addr = rng.getrandbits(32) & ((0xFFFFFFFF << (32 - plen)) & 0xFFFFFFFF)
            nlri = f"{(addr >> 24) & 255}.{(addr >> 16) & 255}.{(addr >> 8) & 255}.{addr & 255}/{plen}"
        kw = dict(
            rib=fam, t=i * 7, session_id=rng.randint(0, 3),
            path_id=rng.randint(0, 5),
        )
        if "vpn" in fam:
            kw["rd"] = f"{rng.randint(0, 65535)}:{rng.randint(0, 99999)}"
        if "lu" in fam or "vpn" in fam:
            kw["labels"] = [rng.randint(16, 1 << 19)
                            for _ in range(rng.randint(1, 3))]
        if rng.random() < 0.2:
            kw["op"] = "withdraw"
        else:
            # alternate Seq/Set: the reference's flat Vec<BgpAS>+Set
            # model cannot distinguish ADJACENT Seq segments (they
            # legitimately merge on re-import), so the fuzz only
            # generates shapes the format represents losslessly
            kw["aspath"] = [
                ("Seq" if k % 2 == 0 else "Set",
                 [rng.getrandbits(32) for _ in range(rng.randint(1, 4))])
                for k in range(rng.randint(1, 3))
            ]
            kw["nexthop"] = (
                f"10.{rng.randint(0, 255)}.0.{rng.randint(1, 254)}"
                if not v6 else "2001:db8::1"
            )
            if rng.random() < 0.4:
                kw["comms"] = [rng.getrandbits(32) for _ in range(rng.randint(1, 3))]
            if rng.random() < 0.3:
                kw["lcomms"] = [(rng.getrandbits(32), 1, 2)]
            if rng.random() < 0.3:
                kw["extcomms"] = [
                    (rng.randint(0, 255), rng.randint(0, 255),
                     rng.getrandbits(32), rng.getrandbits(32))
                    for _ in range(rng.randint(1, 3))
                ]
            if rng.random() < 0.3:
                kw["aggregator_as"] = rng.getrandbits(32)
            if rng.random() < 0.3:
                kw["med"] = rng.getrandbits(32)
            if rng.random() < 0.3:
                kw["localpref"] = rng.getrandbits(32)
            if rng.random() < 0.2:
                kw["atomicaggregate"] = True
            if rng.random() < 0.3:
                kw["originator"] = rng.getrandbits(32)
            if rng.random() < 0.2:
                kw["clusterlist"] = [rng.getrandbits(32)
                                     for _ in range(rng.randint(1, 3))]
            if rng.random() < 0.2:
                kw["pmsi_ta"] = {
                    "flags": rng.randint(0, 255),
                    "tunnel_type": rng.randint(0, 255),
                    "label": rng.getrandbits(20),
                    "tunnel_id": rng.randbytes(rng.randint(0, 8)) or None,
                }
        rows.append(u(nlri, **kw))
    hist = build_history(make_updates(spark, rows))
    snap = tmp_path / "fuzz.cbor"
    export_snapshot(hist, str(snap))
    hist2 = import_snapshot(spark, str(snap))
    cols = [
        "rib", "nlri_str", "rd_hi", "rd_lo", "addr_v4", "addr_v6",
        "prefixlen", "labels", "session_id", "path_id", "ts", "active",
        "origin", "nexthop_v4", "nexthop_v6", "aspath", "comms",
        "lcomms", "extcomms", "med", "localpref", "atomicaggregate",
        "aggregator_as", "originator", "clusterlist", "pmsi_ta",
    ]
    orig = sorted(map(repr, hist.select(cols).collect()))
    back = sorted(map(repr, hist2.select(cols).collect()))
    assert back == orig
