"""Export the engine's rib_history as a bgpexplorer CBOR RIB snapshot.

The reverse of tools/import_snapshot.py — the migration path BACK to a
reference deployment (or between engine instances through the reference's
at-rest format): 15 concatenated CBOR documents in table declaration
order (src/bgprib.rs:903-948), each the table's
``BTreeMap<NLRI-key, session → path → (ts_millis → BgpAttrEntry)>``
with BgpAttrEntry {Active, Attrs, Labels} (src/bgpattrs.rs:375-391) and
addresses as octet arrays (serde non-human-readable std::net shape).

Families exported with full key structure: the v4/v6 unicast/multicast
tables, the labeled-unicast tables (Labeled wrapper), and the VPN
tables (RD + Labeled wrappers) — i.e. every family whose key is
prefix-shaped. The exotic-key families (mvpn/evpn/l2vpls/fs4u/mdt) are
emitted as EMPTY tables with a warning: their nlri_str forms survive in
engine parquet, but the reference's per-family key structs carry more
state than the flat key columns round-trip losslessly, and silently
emitting a lossy struct would corrupt a reference RIB rather than
migrate it.

Attr fidelity: Origin / Nexthop / Aspath (Seq runs flattened, Sets kept
as {"Set": [...]}) / Comms / LComms / Med / Localpref / PmsiTa write
shapes import_snapshot reads back verbatim (round-trip-tested).
ExtComms are emitted empty: zettabgp models them as a 14-variant typed
enum and a wrong variant guess would not deserialize.

Usage:
    python tools/export_snapshot.py HISTORY_PARQUET_DIR OUT_SNAPSHOT_FILE

Scale note: a reference snapshot is by definition a single file written
by a single process (src/bgprib.rs:903), so the export collects the
newest-history rows to the driver — bounded by what the reference
itself could hold in one process, not by the engine's table sizes. The
pre-collect projection and ordering run distributed.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.import_snapshot import SNAPSHOT_RIB_ORDER, cbor_encode

# prefix-shaped key families the export can write losslessly
_EXPORTABLE = {
    "ipv4u", "ipv4m", "ipv4lu", "vpnv4u", "vpnv4m",
    "ipv6u", "ipv6lu", "vpnv6u", "vpnv6m",
}

_ORIGIN_OUT = {"IGP": "Igp", "EGP": "Egp", "Incomplete": "Incomplete"}


def _v4_octets(v: int) -> list[int]:
    return [(v >> 24) & 255, (v >> 16) & 255, (v >> 8) & 255, v & 255]


def _key_obj(row) -> dict:
    """Engine key columns → the zettabgp-shaped NLRI key map."""
    if row["addr_v4"] is not None:
        addr = {"addr": _v4_octets(int(row["addr_v4"])),
                "prefixlen": int(row["prefixlen"])}
    else:
        addr = {"addr": list(bytes(row["addr_v6"])),
                "prefixlen": int(row["prefixlen"])}
    if row["labels"]:
        addr = {"labels": {"labels": [int(x) for x in row["labels"]]},
                "addr": addr}
    if row["rd_hi"] is not None:
        return {"rd": {"rdh": int(row["rd_hi"]), "rdl": int(row["rd_lo"])},
                "addr": addr}
    return addr


def _aspath_obj(segs) -> list | None:
    if segs is None:
        return None
    out: list = []
    for s in segs:
        asns = [{"value": int(a)} for a in (s["asns"] or [])]
        if s["kind"] == "Set":
            out.append({"Set": asns})
        else:
            out.extend(asns)
    return out


def _attrs_obj(row) -> dict:
    nh = None
    if row["nexthop_v4"] is not None:
        nh = {"V4": _v4_octets(int(row["nexthop_v4"]))}
    elif row["nexthop_v6"] is not None:
        nh = {"V6": list(bytes(row["nexthop_v6"]))}
    pmsi = None
    p = row["pmsi_ta"]
    if p is not None:
        pmsi = {
            "flags": p["flags"], "tunnel_type": p["tunnel_type"],
            "label": p["label"],
            "tunnel_id": list(p["tunnel_id"]) if p["tunnel_id"] is not None else None,
        }
    return {
        "Origin": _ORIGIN_OUT.get(row["origin"]),
        "Nexthop": nh,
        "Aspath": _aspath_obj(row["aspath"]),
        "Comms": [{"value": int(c)} for c in row["comms"]] if row["comms"] else None,
        "LComms": (
            [{"ga": x["ga"], "ldp1": x["ldp1"], "ldp2": x["ldp2"]}
             for x in row["lcomms"]]
            if row["lcomms"] else None
        ),
        # zettabgp BgpExtCommunity is the flat {ctype, subtype, a, b}
        # struct (the reference constructs exactly that literal,
        # src/ribfilter.rs:1996-2000); the list serializes as a plain seq
        # like Comms/LComms.
        "ExtComms": (
            [{"ctype": int(x["ctype"]), "subtype": int(x["subtype"]),
              "a": int(x["a"]), "b": int(x["b"])}
             for x in row["extcomms"]]
            if row["extcomms"] else None
        ),
        "Med": row["med"],
        "Localpref": row["localpref"],
        # Both are Option<std::net::IpAddr> in the reference
        # (src/bgpattrs.rs:30-33, strict serde deserialize) — emit the
        # serde non-human-readable IpAddr shape {"V4": [octets]}, never a
        # bool/uint, or the reference cannot load the file. The engine
        # stores only the atomic-aggregate FLAG (wire attr 6 is
        # zero-length), so flag-present is encoded as 0.0.0.0.
        "Atomicaggregate": (
            {"V4": [0, 0, 0, 0]} if row["atomicaggregate"] else None
        ),
        # Option<BgpAggregatorAS> {asn: u32, addr: Ipv4Addr}
        # (src/bgpattrs.rs:31). The engine stores only the ASN (the wire
        # decode drops the router-id half, sources/mrt.py attr 7), so the
        # addr exports as 0.0.0.0 — same lossy-half convention as the
        # Atomicaggregate flag.
        "Aggregatoras": (
            {"asn": int(row["aggregator_as"]), "addr": [0, 0, 0, 0]}
            if row["aggregator_as"] is not None else None
        ),
        "Originator": (
            {"V4": _v4_octets(int(row["originator"]))}
            if row["originator"] is not None else None
        ),
        "Clusterlist": (
            [int(c) for c in row["clusterlist"]] if row["clusterlist"] else None
        ),
        "PmsiTa": pmsi,
    }


def export_snapshot(history, out_path: str) -> dict[str, int]:
    """Write ``history`` (a rib_history DataFrame) as a reference CBOR
    snapshot at ``out_path``; returns per-rib exported row counts.
    Non-prefix-shaped families are skipped with a stderr warning."""
    import pyspark.sql.functions as F

    cols = [
        "rib", "nlri_str", "rd_hi", "rd_lo", "addr_v4", "addr_v6",
        "prefixlen", "labels", "session_id", "path_id", "active",
        "origin", "nexthop_v4", "nexthop_v6", "aspath", "comms", "lcomms",
        "extcomms", "med", "localpref", "atomicaggregate", "aggregator_as",
        "originator", "clusterlist", "pmsi_ta",
    ]
    rows = (
        history.select(*cols, F.col("ts").cast("double").alias("_ts_s"))
        .orderBy("rib", "nlri_str", "session_id", "path_id", "_ts_s")
        .collect()
    )
    tables: dict[str, dict] = {r: {} for r in SNAPSHOT_RIB_ORDER}
    counts: dict[str, int] = {}
    skipped: set[str] = set()
    for r in rows:
        rib = r["rib"]
        if rib not in _EXPORTABLE:
            if rib in tables:
                skipped.add(rib)
            continue
        key = r["nlri_str"]  # stable grouping key; the encoded key map
        t = tables[rib].setdefault(key, {"_key": _key_obj(r), "sess": {}})
        hist = (
            t["sess"].setdefault(int(r["session_id"]), {})
            .setdefault(int(r["path_id"]), {})
        )
        hist[int(r["_ts_s"] * 1000)] = {
            "Active": bool(r["active"]),
            "Attrs": _attrs_obj(r),
            "Labels": None,
        }
        counts[rib] = counts.get(rib, 0) + 1
    for rib in sorted(skipped):
        print(
            f"export_snapshot: skipping non-prefix-keyed family '{rib}' "
            "(lossy in the reference key struct)",
            file=sys.stderr,
        )
    out = bytearray()
    for rib in SNAPSHOT_RIB_ORDER:
        pairs = [
            (t["_key"], t["sess"])
            for _, t in sorted(tables[rib].items())
        ]
        n = len(pairs)
        if n < 24:
            out.append(0xA0 | n)
        elif n < 0x100:
            out += bytes([0xB8, n])
        elif n < 0x10000:
            out += bytes([0xB9, n >> 8, n & 255])
        else:
            out += bytes([0xBA]) + n.to_bytes(4, "big")
        for k, v in pairs:
            out += cbor_encode(k)
            out += cbor_encode(v)
    tmp = Path(out_path).with_suffix(".part")
    tmp.write_bytes(bytes(out))
    tmp.replace(out_path)
    return counts


def main() -> None:
    if len(sys.argv) != 3:
        print(__doc__)
        raise SystemExit(2)
    from bgpexplorer_spark import get_spark

    spark = get_spark("export-snapshot")
    hist = spark.read.parquet(sys.argv[1])
    counts = export_snapshot(hist, sys.argv[2])
    print({"exported": counts})


if __name__ == "__main__":
    main()
