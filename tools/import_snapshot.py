"""Import a bgpexplorer CBOR RIB snapshot into the engine's rib_history.

Migration path for an existing bgpexplorer deployment: the reference
persists its RIB as 15 concatenated CBOR documents — one per SAFI table,
written in declaration order (src/bgprib.rs:903-948 write_snapshot /
973-1015 load_snapshot). Each document is the table's
``BTreeMap<NLRI-key, BgpSessionEntry>`` where the nesting is
NLRI → session_id → path_id → (timestamp_millis → BgpAttrEntry)
(src/bgprib.rs:310-426: BgpAttrHistory/BgpPathEntry/BgpSessionEntry are
all ``#[serde(transparent)]`` BTreeMaps; Timestamp serializes as i64
millis, src/timestamp.rs:58-65; BgpAttrEntry as a 3-field struct
{Active, Attrs, Labels}, src/bgpattrs.rs:375-391; BgpAttrs as a 13-field
struct keyed Origin..PmsiTa, src/bgpattrs.rs:305-325).

The NLRI key / attr leaf types come from the public zettabgp crate's
derived serde, which ciborium renders as string-keyed maps, enum unit
variants as strings, newtype variants as {variant: value}, and
std::net IP addresses (non-human-readable format) as octet arrays. The
extractors below are FIELD-NAME-TOLERANT (they look for the documented
field names but fall back to structural matching: a 4/16-int array is an
address, a 2-int map is an RD) so minor shape drift between zettabgp
versions degrades to a null column, never a crashed import.

Usage:
    python tools/import_snapshot.py SNAPSHOT_FILE OUT_PARQUET_DIR

Then serve it exactly like any engine table:
    history = spark.read.parquet(OUT_PARQUET_DIR)
"""

from __future__ import annotations

import struct
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# write_snapshot order, src/bgprib.rs:907-921 == schemas.RIB_NAMES order
SNAPSHOT_RIB_ORDER = [
    "ipv4u", "ipv4m", "ipv4lu", "vpnv4u", "vpnv4m",
    "ipv6u", "ipv6lu", "vpnv6u", "vpnv6m",
    "l2vpls", "mvpn", "evpn", "fs4u", "ipv4mdt", "ipv6mdt",
]


# --- minimal CBOR (RFC 8949) ------------------------------------------------
# A self-contained subset codec: the snapshot only uses uints, negints,
# byte/text strings, arrays, maps, bools, null, and floats. No external
# dependency; the encoder exists for test fixtures.


class CborMap:
    """Association-list mapping for CBOR maps whose keys are themselves
    maps (BTreeMap<struct, _>): same .items()/.get() surface as dict."""

    __slots__ = ("pairs",)

    def __init__(self, pairs) -> None:
        self.pairs = pairs

    def items(self):
        return self.pairs

    def values(self):
        return [v for _, v in self.pairs]

    def keys(self):
        return [k for k, _ in self.pairs]

    def get(self, key, default=None):
        for k, v in self.pairs:
            if k == key:
                return v
        return default

    def __len__(self) -> int:
        return len(self.pairs)


class CborDecoder:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def eof(self) -> bool:
        return self.pos >= len(self.data)

    def _head(self) -> tuple[int, int]:
        b = self.data[self.pos]
        self.pos += 1
        major, info = b >> 5, b & 0x1F
        if info < 24:
            return major, info
        if info == 24:
            v = self.data[self.pos]
            self.pos += 1
        elif info == 25:
            v = struct.unpack_from(">H", self.data, self.pos)[0]
            self.pos += 2
        elif info == 26:
            v = struct.unpack_from(">I", self.data, self.pos)[0]
            self.pos += 4
        elif info == 27:
            v = struct.unpack_from(">Q", self.data, self.pos)[0]
            self.pos += 8
        else:
            raise ValueError(f"indefinite/reserved CBOR length info {info}")
        return major, v

    def decode(self):
        major, arg = self._head()
        if major == 0:
            return arg
        if major == 1:
            return -1 - arg
        if major == 2:
            v = self.data[self.pos : self.pos + arg]
            self.pos += arg
            return v
        if major == 3:
            v = self.data[self.pos : self.pos + arg].decode("utf-8")
            self.pos += arg
            return v
        if major == 4:
            return [self.decode() for _ in range(arg)]
        if major == 5:
            pairs = [(self.decode(), self.decode()) for _ in range(arg)]
            try:
                return dict(pairs)
            except TypeError:
                # struct-typed BTreeMap keys (the NLRI level) are CBOR
                # maps themselves — unhashable in Python, so fall back to
                # an association-list mapping with the same .items()/.get()
                return CborMap(pairs)
        if major == 6:  # tag: decode and pass through the tagged value
            return self.decode()
        # major 7: simple / float
        if arg == 20:
            return False
        if arg == 21:
            return True
        if arg in (22, 23):
            return None
        # arg carries the raw float bits re-read from width
        width = self.data[self.pos - (2 if arg < 0x10000 else 0) :]
        # re-decode via the head position: info told us the width
        raise ValueError("unexpected simple/float head in snapshot")

    def documents(self):
        while not self.eof():
            yield self.decode()


def cbor_encode(obj) -> bytes:
    """Test-fixture encoder (deterministic, definite lengths)."""
    out = bytearray()

    def head(major: int, n: int) -> None:
        if n < 24:
            out.append((major << 5) | n)
        elif n < 0x100:
            out.append((major << 5) | 24)
            out.append(n)
        elif n < 0x10000:
            out.append((major << 5) | 25)
            out.extend(struct.pack(">H", n))
        elif n < 0x100000000:
            out.append((major << 5) | 26)
            out.extend(struct.pack(">I", n))
        else:
            out.append((major << 5) | 27)
            out.extend(struct.pack(">Q", n))

    def enc(o) -> None:
        if o is None:
            out.append(0xF6)
        elif o is True:
            out.append(0xF5)
        elif o is False:
            out.append(0xF4)
        elif isinstance(o, int):
            if o >= 0:
                head(0, o)
            else:
                head(1, -1 - o)
        elif isinstance(o, bytes):
            head(2, len(o))
            out.extend(o)
        elif isinstance(o, str):
            b = o.encode("utf-8")
            head(3, len(b))
            out.extend(b)
        elif isinstance(o, list):
            head(4, len(o))
            for x in o:
                enc(x)
        elif isinstance(o, dict):
            head(5, len(o))
            for k, v in o.items():
                enc(k)
                enc(v)
        else:
            raise TypeError(f"cbor_encode: {type(o)}")

    enc(obj)
    return bytes(out)


# --- key / attr extraction ---------------------------------------------------


def _as_octets(v) -> bytes | None:
    """An address in non-human-readable serde is its octet array; accept
    a dotted/colon string too (human-readable shape drift)."""
    if isinstance(v, list) and len(v) in (4, 16) and all(
        isinstance(x, int) and 0 <= x < 256 for x in v
    ):
        return bytes(v)
    if isinstance(v, bytes) and len(v) in (4, 16):
        return v
    if isinstance(v, str):
        import ipaddress

        try:
            return ipaddress.ip_address(v).packed
        except ValueError:
            return None
    if isinstance(v, dict) and len(v) == 1:  # IpAddr enum {V4: ...}
        return _as_octets(next(iter(v.values())))
    return None


def _v4_int(octets: bytes) -> int:
    return struct.unpack(">I", octets)[0]


def _ip_str(octets: bytes) -> str:
    import ipaddress

    return str(ipaddress.ip_address(octets))


def _find_rd(key: dict) -> tuple[int, int] | None:
    """BgpRD: a 2-int struct (rdh/rdl in zettabgp); tolerate any field
    names, an 8-byte array, or a u64."""
    for name in ("rd",):
        if name in key:
            v = key[name]
            if isinstance(v, dict) and len(v) == 2:
                a, b = list(v.values())
                if isinstance(a, int) and isinstance(b, int):
                    return a, b
            if isinstance(v, int):
                return v >> 32, v & 0xFFFFFFFF
            o = _as_octets(v) if isinstance(v, (list, bytes)) else None
            if o and len(o) == 8:
                from bgpexplorer_spark.sources.mrt import _rd_decode

                return _rd_decode(o)
    return None


def _find_prefix(key: dict) -> tuple[bytes, int] | None:
    """{addr: octets, prefixlen: n}, possibly nested one level (Labeled /
    WithRd wrap the inner prefix in an ``addr`` field)."""
    if "addr" in key and "prefixlen" in key and isinstance(key["prefixlen"], int):
        o = _as_octets(key["addr"])
        if o is not None:
            return o, key["prefixlen"]
    for v in key.values():
        if isinstance(v, dict):
            got = _find_prefix(v)
            if got:
                return got
    return None


def _find_labels(key: dict) -> list[int] | None:
    """Labeled<T> wraps the inner prefix, so the label stack may sit at
    any nesting level alongside / above the addr."""
    v = key.get("labels")
    if isinstance(v, dict):
        v = v.get("labels")
    if isinstance(v, list) and all(isinstance(x, int) for x in v):
        return v or None
    for sub in key.values():
        if isinstance(sub, dict):
            got = _find_labels(sub)
            if got:
                return got
    return None


def render_key(rib: str, key) -> dict | None:
    """NLRI-key CBOR → engine KEY_FIELDS dict with the same canonical
    nlri_str forms sources/mrt.py emits, so filters and joins treat
    imported rows identically to wire-ingested ones."""
    out: dict = {"rib": rib}
    if not isinstance(key, dict):
        return None
    rd = _find_rd(key)
    labels = _find_labels(key)
    pfx = _find_prefix(key)
    if pfx is None:
        return None
    octets, plen = pfx
    disp = ""
    if rd is not None:
        out["rd_hi"], out["rd_lo"] = rd
        disp += f"{rd[0]}:{rd[1]}:"
    if len(octets) == 4:
        out["addr_v4"] = _v4_int(octets)
    else:
        out["addr_v6"] = octets
    out["prefixlen"] = plen
    out["labels"] = labels
    disp += f"{_ip_str(octets)}/{plen}"
    if labels:
        disp = f"L{','.join(map(str, labels))}:" + disp
    out["nlri_str"] = disp
    return out


_ORIGINS = {0: "IGP", 1: "EGP", 2: "Incomplete"}


def _attr_row(entry: dict) -> dict:
    """BgpAttrEntry {Active, Attrs, Labels} → engine ATTR_FIELDS +
    active. Missing / unrecognized fields → nulls."""
    attrs = entry.get("Attrs") or {}
    row: dict = {"active": bool(entry.get("Active", True))}
    origin = attrs.get("Origin")
    if isinstance(origin, str):
        row["origin"] = {"Igp": "IGP", "Egp": "EGP"}.get(origin, origin)
    elif isinstance(origin, int):
        row["origin"] = _ORIGINS.get(origin)
    nh = attrs.get("Nexthop")
    o = _as_octets(nh) if nh is not None else None
    if o is None and isinstance(nh, dict):
        o = _as_octets(nh.get("addr")) or next(
            (x for x in map(_as_octets, nh.values()) if x), None
        )
    if o is not None and len(o) == 4:
        row["nexthop_v4"] = _v4_int(o)
    elif o is not None:
        row["nexthop_v6"] = o
    asp = attrs.get("Aspath")
    if isinstance(asp, dict):
        asp = asp.get("value") or asp.get("pathes") or list(asp.values())[0] if asp else None
    if isinstance(asp, list):
        segs = []
        flat_run: list[int] = []
        for item in asp:
            if isinstance(item, int):
                flat_run.append(item)
            elif isinstance(item, dict) and "value" in item and isinstance(item["value"], int):
                # zettabgp BgpAS { value: u32 }
                flat_run.append(item["value"])
            elif isinstance(item, dict) and len(item) == 1:
                # a Set segment closes any pending Seq run FIRST so the
                # segment order round-trips (Seq hops may follow a Set)
                if flat_run:
                    segs.append({"kind": "Seq", "asns": flat_run})
                    flat_run = []
                kind, asns = next(iter(item.items()))
                segs.append(
                    {
                        "kind": "Set" if "et" in str(kind) else "Seq",
                        "asns": [
                            a["value"] if isinstance(a, dict) and "value" in a else a
                            for a in (asns if isinstance(asns, list) else [])
                        ],
                    }
                )
        if flat_run:
            segs.append({"kind": "Seq", "asns": flat_run})
        row["aspath"] = segs or None
    comms = attrs.get("Comms")
    if isinstance(comms, dict):
        comms = comms.get("value") or (list(comms.values())[0] if comms else None)
    if isinstance(comms, list):
        vals = []
        for c in comms:
            if isinstance(c, int):
                vals.append(c)
            elif isinstance(c, dict) and "value" in c:
                vals.append(c["value"])
        row["comms"] = vals or None
    ec = attrs.get("ExtComms")
    if isinstance(ec, dict):
        ec = ec.get("value") or (list(ec.values())[0] if ec else None)
    if isinstance(ec, list):
        out = []
        for c in ec:
            # zettabgp BgpExtCommunity {ctype, subtype, a, b}
            # (src/ribfilter.rs:1996-2000)
            if isinstance(c, dict) and all(
                isinstance(c.get(f), int) for f in ("ctype", "subtype", "a", "b")
            ):
                out.append({"ctype": c["ctype"], "subtype": c["subtype"],
                            "a": c["a"], "b": c["b"]})
        row["extcomms"] = out or None
    ag = attrs.get("Aggregatoras")
    if isinstance(ag, int):
        row["aggregator_as"] = ag
    elif isinstance(ag, dict):
        # BgpAggregatorAS {asn, addr} (src/bgpattrs.rs:31); keep the ASN —
        # the engine column is aggregator_as only (wire decode parity)
        asn = next(
            (ag[k] for k in ("asn", "value", "as_num")
             if isinstance(ag.get(k), int)),
            None,
        )
        if asn is not None:
            row["aggregator_as"] = asn
    for src, dst in (("Med", "med"), ("Localpref", "localpref")):
        v = attrs.get(src)
        if isinstance(v, int):
            row[dst] = v
    # Atomicaggregate / Originator are Option<std::net::IpAddr> in the
    # reference (src/bgpattrs.rs:30-33): serde non-human-readable shape is
    # the enum map {"V4": [4 octets]} / {"V6": [16 octets]}. Accept that
    # (reference- and export_snapshot-written files) plus the legacy
    # bool/int forms older engine exports emitted.
    aa = attrs.get("Atomicaggregate")
    if isinstance(aa, bool):
        row["atomicaggregate"] = aa
    elif isinstance(aa, dict) and ("V4" in aa or "V6" in aa):
        row["atomicaggregate"] = True
    orig = attrs.get("Originator")
    if isinstance(orig, int):
        row["originator"] = orig
    elif isinstance(orig, dict) and isinstance(orig.get("value"), int):
        row["originator"] = orig["value"]
    elif isinstance(orig, dict) and isinstance(orig.get("V4"), list):
        o = orig["V4"]
        if len(o) == 4 and all(isinstance(x, int) for x in o):
            row["originator"] = (o[0] << 24) | (o[1] << 16) | (o[2] << 8) | o[3]
    cl = attrs.get("Clusterlist")
    if isinstance(cl, list):
        vals = [
            c["value"] if isinstance(c, dict) and isinstance(c.get("value"), int)
            else c
            for c in cl
        ]
        if all(isinstance(c, int) for c in vals):
            row["clusterlist"] = vals or None
    lc = attrs.get("LComms")
    if isinstance(lc, list):
        out = []
        for c in lc:
            if isinstance(c, dict) and all(
                isinstance(c.get(f), int) for f in ("ga", "ldp1", "ldp2")
            ):
                out.append({"ga": c["ga"], "ldp1": c["ldp1"], "ldp2": c["ldp2"]})
        row["lcomms"] = out or None
    pmsi = attrs.get("PmsiTa")
    if isinstance(pmsi, dict):
        # zettabgp BgpPMSITunnel serde: tolerate either our field names
        # or the crate's (flags/tunnel_type/mpls_label + an id blob)
        tid = pmsi.get("tunnel_id")
        if isinstance(tid, list):
            tid = bytes(x & 0xFF for x in tid if isinstance(x, int))
        row["pmsi_ta"] = {
            "flags": pmsi.get("flags") if isinstance(pmsi.get("flags"), int) else None,
            "tunnel_type": next(
                (pmsi[k] for k in ("tunnel_type", "tunneltype") if isinstance(pmsi.get(k), int)),
                None,
            ),
            "label": next(
                (pmsi[k] for k in ("label", "mpls_label") if isinstance(pmsi.get(k), int)),
                None,
            ),
            "tunnel_id": tid if isinstance(tid, bytes) else None,
        }
    return row


def iter_snapshot_rows(path: str):
    """Yield flat UPDATES-shaped dicts (plus ``active``) from a reference
    CBOR snapshot file: one row per (rib, nlri, session, path, ts)."""
    dec = CborDecoder(Path(path).read_bytes())
    for rib in SNAPSHOT_RIB_ORDER:
        if dec.eof():
            break
        table = dec.decode()
        if not isinstance(table, (dict, CborMap)):
            continue
        for key_obj, sessions in table.items():
            key = render_key(rib, key_obj) if isinstance(key_obj, dict) else None
            if key is None or not isinstance(sessions, dict):
                continue
            for sess_id, paths in sessions.items():
                if not isinstance(paths, dict):
                    continue
                for path_id, hist in paths.items():
                    if not isinstance(hist, dict):
                        continue
                    for ts_ms, entry in sorted(hist.items()):
                        if not isinstance(entry, dict):
                            continue
                        row = dict(key)
                        row.update(_attr_row(entry))
                        row["session_id"] = int(sess_id)
                        row["path_id"] = int(path_id)
                        row["ts_ms"] = int(ts_ms)
                        row["op"] = "update" if row.pop("active") else "withdraw"
                        yield row


def import_snapshot(spark, snapshot_path: str, out_path: str | None = None):
    """Decode the snapshot into UPDATES_SCHEMA rows, run them through the
    standard build_history derivation (active flag, aspath_flat), and
    optionally persist as (rib, ts_date)-partitioned parquet.

    The CBOR walk is a driver-side generator (a reference snapshot is a
    single file written by a single process — tens of MB, not TB); the
    history build and write are normal distributed jobs."""
    import pyspark.sql.functions as F

    from bgpexplorer_spark.operators.ingest import build_history
    from bgpexplorer_spark.schemas import UPDATES_SCHEMA

    rows = []
    for r in iter_snapshot_rows(snapshot_path):
        ts_ms = r.pop("ts_ms")
        import datetime as dt

        r["ts"] = dt.datetime.fromtimestamp(ts_ms / 1000, dt.timezone.utc).replace(
            tzinfo=None
        )
        rows.append(r)
    field_names = [f.name for f in UPDATES_SCHEMA.fields]
    data = [tuple(r.get(n) for n in field_names) for r in rows]
    updates = spark.createDataFrame(data, UPDATES_SCHEMA)
    hist = build_history(updates)
    if out_path:
        from bgpexplorer_spark.operators.rib import write_snapshot

        write_snapshot(hist, out_path)
        hist = spark.read.parquet(out_path)
    return hist


def main() -> None:
    if len(sys.argv) != 3:
        print(__doc__)
        raise SystemExit(2)
    from bgpexplorer_spark.session import get_spark

    spark = get_spark("import_snapshot")
    hist = import_snapshot(spark, sys.argv[1], sys.argv[2])
    print(f"imported {hist.count()} history rows -> {sys.argv[2]}")
    spark.stop()


if __name__ == "__main__":
    main()
