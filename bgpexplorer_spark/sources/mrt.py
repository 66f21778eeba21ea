"""MRT (RFC 6396) dump decoder → UPDATES_SCHEMA rows (SURVEY.md §2.1 S1/S2).

The reference ingests live BGP/BMP sessions (src/bgppeer.rs:179-258 UPDATE
decode, src/bmppeer.rs:65-131 framing); the network daemon is out of the
engine boundary here, but MRT dump files — the standard archival form of
exactly those wire messages (RIS / RouteViews publish one file per 5-15
minutes) — give a pure-parsing batch path from REAL BGP wire format into
the same ``updates`` boundary. Update/withdraw/MP_REACH/MP_UNREACH
handling mirrors src/bgprib.rs:1104-1205 (U7 flattening: one output row
per message × NLRI).

Scale shape: one MRT file is not splittable (variable-length records, no
sync marker), so the unit of parallelism is the FILE — precisely how the
archives are published. ``spark.read.format("binaryFile")`` distributes
whole files to executors and ``mapInPandas`` (Arrow-batched) decodes
them; a 100 TB backfill is tens of thousands of files, which saturates
any cluster without a shuffle.

Supported records: BGP4MP / BGP4MP_ET (types 16/17), subtypes MESSAGE /
MESSAGE_AS4[_ADDPATH] and STATE_CHANGE[_AS4]; TABLE_DUMP v1;
TABLE_DUMP_V2 peer index + RIB v4/v6 unicast[_ADDPATH] + RIB_GENERIC
(any family). Attributes: ORIGIN, AS_PATH, NEXT_HOP, MED, LOCAL_PREF,
ATOMIC_AGGREGATE, AGGREGATOR, COMMUNITY, ORIGINATOR_ID, CLUSTER_LIST,
MP_REACH_NLRI / MP_UNREACH_NLRI across the FULL family matrix the
reference keeps RIBs for — v4/v6 unicast, labeled unicast (RFC 8277),
VPN unicast/multicast (RFC 4364), MDT (RFC 6037), VPLS (RFC 4761),
EVPN (RFC 7432), MVPN (RFC 6514), FlowSpec v4 (RFC 8955) —
EXT_COMMUNITIES, LARGE_COMMUNITY. Unknown attributes/records/families
are skipped, not fatal — dump archives contain junk.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bgpexplorer_spark.schemas import ATTR_FIELDS, KEY_FIELDS, UPDATES_SCHEMA

MRT_TABLE_DUMP_V2 = 13
MRT_BGP4MP = 16
MRT_BGP4MP_ET = 17
BGP4MP_MESSAGE = 1
BGP4MP_MESSAGE_AS4 = 4
BGP4MP_MESSAGE_ADDPATH = 6        # RFC 8050
BGP4MP_MESSAGE_AS4_ADDPATH = 7
TD2_PEER_INDEX_TABLE = 1
TD2_RIB_IPV4_UNICAST = 2
TD2_RIB_GENERIC = 6
TD2_RIB_IPV6_UNICAST = 4
TD2_RIB_IPV4_UNICAST_ADDPATH = 8  # RFC 8050
TD2_RIB_IPV6_UNICAST_ADDPATH = 10

_ORIGINS = {0: "IGP", 1: "EGP", 2: "Incomplete"}

# read_mrt emits peer identity instead of a session_id; assign_sessions
# turns distinct peers into dense ids (the reference registers sessions at
# PeerUp / config time, src/bgpsvc.rs:135-162).
MRT_FIELDS = (
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("peer_addr", T.StringType(), False),
        T.StructField("peer_as", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("path_id", T.LongType(), False),
    ]
    + KEY_FIELDS
    + ATTR_FIELDS
)
MRT_SCHEMA = T.StructType(MRT_FIELDS)


def _v4_str(addr: int) -> str:
    return f"{(addr >> 24) & 255}.{(addr >> 16) & 255}.{(addr >> 8) & 255}.{addr & 255}"


def _v6_str(b: bytes) -> str:
    import ipaddress

    return str(ipaddress.IPv6Address(b))


def _read_prefixes(buf: bytes, off: int, end: int, v6: bool, addpath: bool = False):
    """NLRI list: (plen, ceil(plen/8) prefix bytes)* — src/bgppeer.rs
    UPDATE NLRI walk. ADD-PATH NLRI (RFC 7911/8050) prefixes each entry
    with a 4-byte path identifier. Returns [(addr, plen, path_id)]."""
    out = []
    width = 16 if v6 else 4
    while off < end:
        path_id = 0
        if addpath:
            if off + 5 > end:
                break
            path_id = int.from_bytes(buf[off : off + 4], "big")
            off += 4
        plen = buf[off]
        off += 1
        nbytes = (plen + 7) // 8
        if plen > width * 8 or off + nbytes > end:
            break  # malformed tail — skip rest
        raw = buf[off : off + nbytes] + b"\x00" * (width - nbytes)
        off += nbytes
        if v6:
            out.append((raw, plen, path_id))
        else:
            out.append((int.from_bytes(raw, "big"), plen, path_id))
    return out


def _parse_aspath_segments(val: bytes, asz: int, afmt: str) -> list:
    segs, p = [], 0
    n, ifb = len(val), int.from_bytes
    while p + 2 <= n:
        skind, scount = val[p], val[p + 1]
        p += 2
        asns = []
        for _ in range(scount):
            if p + asz > n:
                break
            asns.append(ifb(val[p : p + asz], "big"))
            p += asz
        segs.append({"kind": "Set" if skind == 1 else "Seq", "asns": asns})
    return segs


def _merge_as4path(aspath: list, as4path: list) -> list:
    """RFC 6793 §4.2.3 reconstruction for 2-octet sessions: when
    AS_PATH (with AS_TRANS placeholders) has at least as many AS numbers
    as AS4_PATH, the true path is the leading (n - n4) AS numbers of
    AS_PATH followed by AS4_PATH; otherwise AS4_PATH is ignored. An
    AS_SET counts as one AS number and is never split."""

    def count(segs: list) -> int:
        return sum(
            1 if s["kind"] == "Set" else len(s["asns"]) for s in segs
        )

    need = count(aspath) - count(as4path)
    if need < 0:
        return aspath
    lead = []
    for s in aspath:
        if need <= 0:
            break
        if s["kind"] == "Set":
            lead.append(s)
            need -= 1
        else:
            take = min(need, len(s["asns"]))
            if take:
                lead.append({"kind": "Seq", "asns": s["asns"][:take]})
            need -= take
    return lead + as4path


# per-record attrs template: .copy() is measurably cheaper than a 16-key
# dict literal in the decode hot loop; the two _mp_* entries are
# reassigned (never mutated in place), so sharing the empty tuples is safe
_EMPTY_ATTRS: dict = {
    "origin": None, "nexthop_v4": None, "nexthop_v6": None,
    "aspath": None, "comms": None, "lcomms": None, "extcomms": None,
    "med": None, "localpref": None, "atomicaggregate": None,
    "aggregator_as": None, "originator": None, "clusterlist": None,
    "pmsi_ta": None,
    "_mp_reach": (), "_mp_unreach": (),  # [(key_dict, path_id)]
}


def _parse_attrs(
    buf: bytes, off: int, end: int, as4: bool,
    table_dump: bool = False, addpath: bool = False,
) -> dict:
    """Path attributes → the 13-field BgpAttrs dict + MP fragments
    (attr ids per src/bgpattrs.rs; MP handling src/bgprib.rs:1104-1205).
    ``table_dump``: in TABLE_DUMP_V2 RIB entries MP_REACH_NLRI is encoded
    as nexthop-length + nexthop ONLY (RFC 6396 §4.3.4) — the prefix lives
    in the record header."""
    a: dict = _EMPTY_ATTRS.copy()  # fresh dict per record, shared shape
    asz = 4 if as4 else 2
    afmt = ">I" if as4 else ">H"
    ifb = int.from_bytes
    while off < end:
        if off + 2 > end:
            break
        flags, atype = buf[off], buf[off + 1]
        off += 2
        if flags & 0x10:  # extended length
            if off + 2 > end:
                break
            alen = ifb(buf[off : off + 2], "big")
            off += 2
        else:
            alen = buf[off]
            off += 1
        val = buf[off : off + alen]
        off += alen
        if len(val) < alen:
            # truncated attribute section: the struct.unpack decoders
            # this walk used to run raised on short slices and the
            # caller dropped the whole record; int.from_bytes would
            # silently decode the surviving bytes into a wrong value
            # (e.g. a 2-byte tail as nexthop 0.0.10.0) — keep the old
            # drop-the-record contract
            raise ValueError("truncated path attribute")
        if atype == 1 and alen >= 1:
            a["origin"] = _ORIGINS.get(val[0])
        elif atype == 2:
            a["aspath"] = _parse_aspath_segments(val, asz, afmt)
        elif atype == 3 and alen == 4:
            a["nexthop_v4"] = ifb(val, "big")
        elif atype == 4 and alen == 4:
            a["med"] = ifb(val, "big")
        elif atype == 5 and alen == 4:
            a["localpref"] = ifb(val, "big")
        elif atype == 6:
            a["atomicaggregate"] = True
        elif atype == 7 and alen >= asz + 4:
            a["aggregator_as"] = ifb(val[:asz], "big")
        elif atype == 8:
            a["comms"] = [
                ifb(val[i : i + 4], "big")
                for i in range(0, len(val) - 3, 4)
            ]
        elif atype == 9 and alen == 4:
            a["originator"] = ifb(val, "big")
        elif atype == 10:
            a["clusterlist"] = [
                ifb(val[i : i + 4], "big")
                for i in range(0, len(val) - 3, 4)
            ]
        elif atype == 14 and table_dump and alen >= 1:
            # TABLE_DUMP_V2 form: nhlen + nexthop only (RFC 6396 §4.3.4)
            nhlen = val[0]
            if nhlen >= 16:
                a["nexthop_v6"] = val[1:17]
            elif nhlen == 4:
                a["nexthop_v4"] = ifb(val[1:5], "big")
        elif atype == 14 and alen >= 5:  # MP_REACH_NLRI — full family matrix
            afi, safi, nhlen = ifb(val[:2], "big"), val[2], val[3]
            nh = val[4 : 4 + nhlen]
            if safi in (128, 129) and len(nh) in (12, 24):
                nh = nh[8:]  # VPN nexthops carry an RD prefix (RFC 4364 §4.3.2)
            if len(nh) >= 16:
                a["nexthop_v6"] = nh[:16]
            elif len(nh) == 4:
                a["nexthop_v4"] = ifb(nh, "big")
            p = 4 + nhlen + 1  # + reserved SNPA byte
            a["_mp_reach"] = _decode_mp_nlri(afi, safi, val, p, len(val), addpath)
        elif atype == 15 and alen >= 3:  # MP_UNREACH_NLRI — full family matrix
            afi, safi = ifb(val[:2], "big"), val[2]
            a["_mp_unreach"] = _decode_mp_nlri(afi, safi, val, 3, len(val), addpath)
        elif atype == 17 and not as4:
            # AS4_PATH (RFC 6793 §3): true 4-octet path alongside the
            # AS_TRANS-laden AS_PATH of a 2-octet session
            a["_as4path"] = _parse_aspath_segments(val, 4, ">I")
        elif atype == 18 and not as4 and alen >= 8:
            a["_as4aggregator"] = ifb(val[:4], "big")
        elif atype == 16:
            a["extcomms"] = [
                {
                    "ctype": val[i],
                    "subtype": val[i + 1],
                    "a": ifb(val[i + 2 : i + 4], "big"),
                    "b": ifb(val[i + 4 : i + 8], "big"),
                }
                for i in range(0, len(val) - 7, 8)
            ]
        elif atype == 22 and alen >= 5:
            # PMSI tunnel attribute (RFC 6514 §5; reference `pmsi_ta`,
            # src/bgpattrs.rs:34): flags, tunnel type, 3-octet MPLS
            # label (value in the upper 20 bits), then the
            # type-specific tunnel identifier.
            a["pmsi_ta"] = {
                "flags": val[0],
                "tunnel_type": val[1],
                "label": (val[2] << 16 | val[3] << 8 | val[4]) >> 4,
                "tunnel_id": val[5:] or None,
            }
        elif atype == 32:
            a["lcomms"] = [
                dict(
                    zip(
                        ("ga", "ldp1", "ldp2"),
                        struct.unpack(">III", val[i : i + 12]),
                    )
                )
                for i in range(0, len(val) - 11, 12)
            ]
    if a.get("_as4path") and a.get("aspath") is not None:
        a["aspath"] = _merge_as4path(a["aspath"], a.pop("_as4path"))
    if a.get("_as4aggregator") and a.get("aggregator_as") == 23456:
        a["aggregator_as"] = a.pop("_as4aggregator")
    return a


_NULL_KEYS = {f.name: None for f in KEY_FIELDS}
_ATTR_NAMES = [f.name for f in ATTR_FIELDS]
# full-null row template: one dict copy + targeted assignments beats
# rebuilding the 30-key dict field-by-field in the decode hot loop
_NULL_ROW = {
    "ts": None, "peer_addr": None, "peer_as": None, "op": None,
    "path_id": 0, **_NULL_KEYS, **dict.fromkeys(_ATTR_NAMES),
}


def _emit(ts, peer_addr, peer_as, op, key: dict, attrs: dict | None,
          path_id: int = 0) -> dict:
    row = dict(_NULL_ROW)
    row["ts"] = ts
    row["peer_addr"] = peer_addr
    row["peer_as"] = peer_as
    row["op"] = op
    row["path_id"] = path_id
    row.update(key)
    if attrs is not None:
        for n in _ATTR_NAMES:
            row[n] = attrs[n]
    return row


def _v4_key(addr: int, plen: int) -> dict:
    return {
        "rib": "ipv4u",
        "nlri_str": f"{_v4_str(addr)}/{plen}",
        "addr_v4": addr,
        "prefixlen": plen,
    }


def _v6_key(raw: bytes, plen: int) -> dict:
    return {
        "rib": "ipv6u",
        "nlri_str": f"{_v6_str(raw)}/{plen}",
        "addr_v6": raw,
        "prefixlen": plen,
    }


# ---------------------------------------------------------------------------
# Multiprotocol NLRI — the full family matrix the reference ingests into
# its 15 RIBs (src/bgprib.rs:807-821; wire formats RFC 4760/8277/4364/
# 4761/7432/6514/6037/8955). Display forms match the engine's canonical
# nlri_str (tests/ribdata.py and the filter fixtures).
# ---------------------------------------------------------------------------

_RD_IP_FLAG = 0x10000  # IP-form RD marker (functions/codecs.RD_IP_FLAG)


def _rd_decode(b8: bytes) -> tuple[int, int]:
    """8-byte wire RD → (rd_hi, rd_lo) in the engine's numeric layout
    (type 1 IP-form carries the 0x10000 marker, src/ribfilter.rs:
    1089-1129 display convention)."""
    rtype = struct.unpack(">H", b8[:2])[0]
    if rtype == 1:
        ip, num = struct.unpack(">IH", b8[2:8])
        return _RD_IP_FLAG | (ip >> 16), ((ip & 0xFFFF) << 16) | num
    if rtype == 2:
        adm, num = struct.unpack(">IH", b8[2:8])
        return adm, num
    adm, num = struct.unpack(">HI", b8[2:8])
    return adm, num


def _rd_str(hi: int, lo: int) -> str:
    return f"{hi}:{lo}"


def _label_stack(buf: bytes, p: int, limit: int) -> tuple[list[int], int]:
    """RFC 8277 label stack: 3-byte entries, 20-bit label + S bit; the
    0x800000 compatibility value (withdraws) also ends the stack."""
    labels = []
    while p + 3 <= limit:
        v = (buf[p] << 16) | (buf[p + 1] << 8) | buf[p + 2]
        p += 3
        labels.append(v >> 4)
        if v & 1 or v == 0x800000:
            break
    return labels, p


def _iter_addpath(buf: bytes, p: int, end: int, addpath: bool):
    """Yield (path_id, offset) pairs: the caller advances the offset."""
    pid = 0
    if addpath and p + 4 <= end:
        pid = struct.unpack(">I", buf[p : p + 4])[0]
        p += 4
    return pid, p


def _ip_str(raw: bytes, v6: bool) -> str:
    if v6:
        return _v6_str(raw.ljust(16, b"\x00"))
    return _v4_str(struct.unpack(">I", raw.ljust(4, b"\x00"))[0])


def _decode_mp_nlri(
    afi: int, safi: int, buf: bytes, p: int, end: int, addpath: bool
) -> "list[tuple[dict, int]]":
    """MP_REACH/MP_UNREACH NLRI payload → [(key_dict, path_id)] for every
    family the reference ingests; unknown (afi, safi) decode to nothing
    (the reference likewise drops families it has no RIB for)."""
    v6 = afi == 2
    out: list[tuple[dict, int]] = []
    if afi in (1, 2) and safi == 1:  # unicast over MP (v4 legal, v6 usual)
        for raw, plen, pid in _read_prefixes(buf, p, end, v6=v6, addpath=addpath):
            out.append((_v6_key(raw, plen) if v6 else _v4_key(raw, plen), pid))
        return out
    if afi in (1, 2) and safi in (4, 128, 129):  # labeled / VPN unicast+mcast
        vpn = safi in (128, 129)
        rib = {
            (1, 4): "ipv4lu", (2, 4): "ipv6lu",
            (1, 128): "vpnv4u", (2, 128): "vpnv6u",
            (1, 129): "vpnv4m", (2, 129): "vpnv6m",
        }[(afi, safi)]
        while p < end:
            pid, p = _iter_addpath(buf, p, end, addpath)
            if p >= end:
                break
            bits = buf[p]
            p += 1
            entry_end = p + (bits + 7) // 8
            if entry_end > end:
                break
            labels, q = _label_stack(buf, p, entry_end)
            key: dict = {"rib": rib, "labels": labels or None}
            disp = ""
            if vpn:
                if q + 8 > entry_end:
                    break
                hi, lo = _rd_decode(buf[q : q + 8])
                q += 8
                key["rd_hi"], key["rd_lo"] = hi, lo
                disp = _rd_str(hi, lo) + ":"
            plen = bits - (q - p) * 8
            raw = buf[q:entry_end]
            if plen < 0:
                break
            if v6:
                key["addr_v6"] = raw.ljust(16, b"\x00")[:16]
            else:
                key["addr_v4"] = struct.unpack(">I", raw.ljust(4, b"\x00")[:4])[0]
            key["prefixlen"] = plen
            disp += f"{_ip_str(raw, v6)}/{plen}"
            if labels:
                disp = f"L{','.join(map(str, labels))}:" + disp
            key["nlri_str"] = disp
            out.append((key, pid))
            p = entry_end
        return out
    if afi in (1, 2) and safi == 66:  # MDT (RFC 6037): RD + source + group
        asz = 16 if v6 else 4
        fixed = 8 + 2 * asz
        while p < end:
            pid, p = _iter_addpath(buf, p, end, addpath)
            if p >= end:
                break
            bits = buf[p]  # 0x80 for v4; the body is fixed-size either way
            p += 1
            need = max((bits + 7) // 8, fixed) if not v6 else fixed
            if p + need > end:
                break
            hi, lo = _rd_decode(buf[p : p + 8])
            src = buf[p + 8 : p + 8 + asz]
            grp = buf[p + 8 + asz : p + 8 + 2 * asz]
            key = {
                "rib": "ipv6mdt" if v6 else "ipv4mdt",
                "rd_hi": hi, "rd_lo": lo,
                "prefixlen": 128 if v6 else 32,
            }
            if v6:
                key["addr_v6"] = src
                key["mdt_group_v6"] = grp
            else:
                key["addr_v4"] = struct.unpack(">I", src)[0]
                key["mdt_group_v4"] = struct.unpack(">I", grp)[0]
            key["nlri_str"] = (
                f"{_rd_str(hi, lo)}:{_ip_str(src, v6)}/{key['prefixlen']}"
                f":G{_ip_str(grp, v6)}"
            )
            out.append((key, pid))
            p += need
        return out
    if afi == 25 and safi == 65:  # VPLS (RFC 4761 §3.2.2)
        while p + 2 <= end:
            pid, p = _iter_addpath(buf, p, end, addpath)
            if p + 2 > end:
                break
            nlen = struct.unpack(">H", buf[p : p + 2])[0]
            p += 2
            if nlen < 15 or p + nlen > end:
                break
            hi, lo = _rd_decode(buf[p : p + 8])
            ve, off, rng = struct.unpack(">HHH", buf[p + 8 : p + 14])
            base = (buf[p + 14] << 16) | (buf[p + 15] << 8) | buf[p + 16]
            key = {
                "rib": "l2vpls", "rd_hi": hi, "rd_lo": lo,
                "l2_site": ve, "l2_offset": off, "l2_range": rng,
                "labels": [base >> 4], "addr_v4": 0, "prefixlen": 0,
                "nlri_str": f"L2:{ve}:{off}-{rng}:{_rd_str(hi, lo)}:0.0.0.0/0",
            }
            out.append((key, pid))
            p += nlen
        return out
    if afi == 25 and safi == 70:  # EVPN (RFC 7432 §7)
        while p + 2 <= end:
            pid, p = _iter_addpath(buf, p, end, addpath)
            if p + 2 > end:
                break
            rtype, rlen = buf[p], buf[p + 1]
            p += 2
            if p + rlen > end or rlen < 8:
                break
            body = buf[p : p + rlen]
            hi, lo = _rd_decode(body[:8])
            key = {
                "rib": "evpn", "rd_hi": hi, "rd_lo": lo,
                "evpn_type": rtype, "addr_v4": 0, "prefixlen": 0,
            }
            ip_raw, ip_bits = b"", 0
            if rtype == 2 and len(body) >= 25 + 6:
                # RD + ESI(10) + EthTag(4) + maclen(1) + MAC(6) + iplen +
                # IP + MPLS label(s)
                q = 8 + 10 + 4
                maclen = body[q] // 8
                q += 1 + maclen
                ip_bits = body[q] if q < len(body) else 0
                ip_raw = body[q + 1 : q + 1 + ip_bits // 8]
                q += 1 + ip_bits // 8
                if q + 3 <= len(body):
                    labels, _ = _label_stack(body, q, len(body))
                    key["labels"] = labels or None
            elif rtype == 1 and len(body) >= 25:
                # Ethernet A-D: RD + ESI(10) + EthTag(4) + label — rd-only
                # match (src/ribfilter.rs:389-393); keep the label
                labels, _ = _label_stack(body, 22, len(body))
                key["labels"] = labels or None
            elif rtype == 3 and len(body) >= 13:
                # IMET: RD + EthTag(4) + iplen + originator IP
                ip_bits = body[12]
                ip_raw = body[13 : 13 + ip_bits // 8]
            elif rtype == 4 and len(body) >= 19:
                # Ethernet Segment: RD + ESI(10) + iplen + originator IP
                ip_bits = body[18]
                ip_raw = body[19 : 19 + ip_bits // 8]
            elif rtype == 5 and len(body) >= 23:
                # IP prefix: RD + ESI(10) + EthTag(4) + plen + prefix +
                # GW IP + label. The reference matches the GATEWAY
                # (src/ribfilter.rs:424-431 gw_ip), so the gateway lands
                # in the addr columns; the prefix stays in the display.
                ip_bits = body[22]
                nb = (ip_bits + 7) // 8
                ip_raw = body[23 : 23 + nb]
                gw_w = 16 if ip_bits > 32 else 4
                gw = body[23 + nb : 23 + nb + gw_w]
                if len(gw) == gw_w:
                    is6 = gw_w == 16
                    if is6:
                        key["addr_v6"] = gw
                        key["addr_v4"] = None
                    else:
                        key["addr_v4"] = struct.unpack(">I", gw)[0]
                    key["prefixlen"] = ip_bits
                key["nlri_str"] = (
                    f"E5:{_rd_str(hi, lo)}:{_ip_str(ip_raw, ip_bits > 32)}"
                    f"/{ip_bits}"
                )
                out.append((key, pid))
                p += rlen
                continue
            if ip_bits in (32, 128):
                is6 = ip_bits > 32
                if is6:
                    key["addr_v6"] = ip_raw.ljust(16, b"\x00")[:16]
                    key["addr_v4"] = None
                else:
                    key["addr_v4"] = struct.unpack(
                        ">I", ip_raw.ljust(4, b"\x00")[:4])[0]
                key["prefixlen"] = 128 if is6 else 32
                disp_ip = f"{_ip_str(ip_raw, is6)}/{key['prefixlen']}"
            else:
                disp_ip = "0.0.0.0/0"
            key["nlri_str"] = f"E{rtype}:{_rd_str(hi, lo)}:{disp_ip}"
            out.append((key, pid))
            p += rlen
        return out
    if afi == 1 and safi == 5:  # MVPN (RFC 6514 §4)
        while p + 2 <= end:
            pid, p = _iter_addpath(buf, p, end, addpath)
            if p + 2 > end:
                break
            rtype, rlen = buf[p], buf[p + 1]
            p += 2
            if p + rlen > end or rlen < 8:
                break
            body = buf[p : p + rlen]
            if rtype == 4 and len(body) >= 14 and body[0] == 3:
                # Leaf A-D: route key = the embedded S-PMSI route (type +
                # len + body) + originator (RFC 6514 §4.4) — the RD lives
                # inside the embedded route
                hi, lo = _rd_decode(body[2:10])
                orig_off = 2 + body[1]
            else:
                hi, lo = _rd_decode(body[:8])
                orig_off = None
            key = {
                "rib": "mvpn", "rd_hi": hi, "rd_lo": lo,
                "mvpn_type": rtype, "addr_v4": 0, "prefixlen": 0,
            }
            disp_ip = "0.0.0.0/0"

            def sg(q: int) -> "tuple[int | None, int | None]":
                # mc-source-len + source + mc-group-len + group (§4.3)
                if q + 5 > len(body) or body[q] != 32:
                    return None, None
                s = struct.unpack(">I", body[q + 1 : q + 5])[0]
                q += 5
                if q + 5 > len(body) or body[q] != 32:
                    return s, None
                return s, struct.unpack(">I", body[q + 1 : q + 5])[0]

            if rtype == 1 and len(body) >= 12:
                orig = struct.unpack(">I", body[8:12])[0]
                key["mvpn_originator_v4"] = orig
                key["addr_v4"], key["prefixlen"] = orig, 32
                disp_ip = f"{_v4_str(orig)}/32"
            elif rtype == 3 and len(body) >= 8 + 5 + 5 + 4:
                # S-PMSI A-D: RD + source + group + originating router
                s, g = sg(8)
                if s is not None and g is not None:
                    key["mvpn_source_v4"], key["mvpn_group_v4"] = s, g
                    orig = struct.unpack(">I", body[18:22])[0]
                    key["mvpn_originator_v4"] = orig
                    key["addr_v4"], key["prefixlen"] = s, 32
                    disp_ip = f"{_v4_str(s)}/32"
            elif rtype == 4 and orig_off is not None \
                    and orig_off + 4 <= len(body):
                orig = struct.unpack(">I", body[orig_off : orig_off + 4])[0]
                key["mvpn_originator_v4"] = orig
                # the embedded S-PMSI route's source/group also drive the
                # reference's nested spmsi match (src/ribfilter.rs:346-353)
                if len(body) >= 2 + 8 + 5 + 5:
                    s, g = sg(10)
                    if s is not None and g is not None:
                        key["mvpn_source_v4"], key["mvpn_group_v4"] = s, g
                key["addr_v4"], key["prefixlen"] = orig, 32
                disp_ip = f"{_v4_str(orig)}/32"
            elif rtype == 5 and len(body) >= 8 + 5 + 5:
                s, g = sg(8)
                if s is not None and g is not None:
                    key["mvpn_source_v4"], key["mvpn_group_v4"] = s, g
                    key["addr_v4"], key["prefixlen"] = s, 32
                    disp_ip = f"{_v4_str(s)}/32"
            elif rtype in (6, 7) and len(body) >= 8 + 4 + 5 + 5:
                # C-multicast (§4.6/4.7): RD + source-AS + RP/source + group
                s, g = sg(12)
                if s is not None and g is not None:
                    key["mvpn_source_v4"], key["mvpn_group_v4"] = s, g
                    key["addr_v4"], key["prefixlen"] = s, 32
                    disp_ip = f"{_v4_str(s)}/32"
            key["nlri_str"] = f"T{rtype}:{_rd_str(hi, lo)}:{disp_ip}"
            out.append((key, pid))
            p += rlen
        return out
    if afi == 1 and safi == 133:  # FlowSpec v4 (RFC 8955 §4)
        while p < end:
            pid, p = _iter_addpath(buf, p, end, addpath)
            if p >= end:
                break
            flen = buf[p]
            p += 1
            if flen >= 0xF0:  # 2-byte length form
                if p >= end:
                    break
                flen = ((flen & 0x0F) << 8) | buf[p]
                p += 1
            if p + flen > end:
                break
            comp = buf[p : p + flen]
            key = {"rib": "fs4u", "addr_v4": 0, "prefixlen": 0}
            # surface the destination-prefix component (type 1) as the key
            if len(comp) >= 2 and comp[0] == 1:
                plen = comp[1]
                raw = comp[2 : 2 + (plen + 7) // 8]
                key["addr_v4"] = struct.unpack(">I", raw.ljust(4, b"\x00")[:4])[0]
                key["prefixlen"] = plen
                key["nlri_str"] = f"FS:{_ip_str(raw, False)}/{plen}"
            else:
                key["nlri_str"] = "FS:" + comp.hex()
            out.append((key, pid))
            p += flen
        return out
    return out


def parse_bgp_update(
    body: bytes, p: int, end: int, ts, peer_addr: str, peer_as: int,
    as4: bool = True, addpath: bool = False,
):
    """One BGP UPDATE body (after the 19-byte message header) → emitted
    rows — shared by the MRT BGP4MP and BMP Route Monitoring walks
    (reference decode src/bgppeer.rs:179-258)."""
    wlen = int.from_bytes(body[p : p + 2], "big")
    p += 2
    withdrawn = _read_prefixes(body, p, p + wlen, v6=False, addpath=addpath)
    p += wlen
    alen = int.from_bytes(body[p : p + 2], "big")
    p += 2
    attrs = _parse_attrs(body, p, p + alen, as4, addpath=addpath)
    nlri = _read_prefixes(body, p + alen, end, v6=False, addpath=addpath)

    for addr, plen, pid in withdrawn:
        yield _emit(ts, peer_addr, peer_as, "withdraw", _v4_key(addr, plen), None, pid)
    for key, pid in attrs["_mp_unreach"]:
        yield _emit(ts, peer_addr, peer_as, "withdraw", key, None, pid)
    for addr, plen, pid in nlri:
        yield _emit(ts, peer_addr, peer_as, "update", _v4_key(addr, plen), attrs, pid)
    for key, pid in attrs["_mp_reach"]:
        yield _emit(ts, peer_addr, peer_as, "update", key, attrs, pid)


_PEER_STR: dict[bytes, str] = {}


def _peer_str(peer_ip: bytes, ipw: int) -> str:
    """Peer-address rendering memo: an archive has a handful of peers
    but millions of records; the dict hit replaces per-record int
    parsing + f-string formatting. Bounded by the distinct-peer count
    (capped defensively)."""
    got = _PEER_STR.get(peer_ip)
    if got is None:
        got = (
            _v4_str(int.from_bytes(peer_ip, "big"))
            if ipw == 4 else _v6_str(peer_ip)
        )
        if len(_PEER_STR) < 65536:
            _PEER_STR[peer_ip] = got
    return got


def _parse_bgp4mp(body: bytes, ts_sec: int, mtype: int, subtype: int):
    import datetime as dt

    p = 0
    usec = 0
    if mtype == MRT_BGP4MP_ET:
        usec = int.from_bytes(body[:4], "big")
        p = 4
    as4 = subtype in (BGP4MP_MESSAGE_AS4, BGP4MP_MESSAGE_AS4_ADDPATH)
    addpath = subtype in (BGP4MP_MESSAGE_ADDPATH, BGP4MP_MESSAGE_AS4_ADDPATH)
    asz = 4 if as4 else 2
    peer_as = int.from_bytes(body[p : p + asz], "big")
    p += 2 * asz  # peer_as + local_as
    p += 2  # ifindex
    afi = int.from_bytes(body[p : p + 2], "big")
    p += 2
    ipw = 4 if afi == 1 else 16
    peer_ip = body[p : p + ipw]
    p += 2 * ipw  # peer + local ip
    peer_addr = _peer_str(peer_ip, ipw)
    # BGP message: 16B marker + length(2) + type(1)
    if p + 19 > len(body):
        return
    btype = body[p + 18]
    p += 19
    if btype != 2:  # not an UPDATE
        return
    ts = dt.datetime.fromtimestamp(ts_sec + usec / 1e6, tz=dt.timezone.utc).replace(
        tzinfo=None
    )
    yield from parse_bgp_update(body, p, len(body), ts, peer_addr, peer_as, as4, addpath)


def _parse_peer_index(body: bytes) -> list[tuple[str, int]]:
    """TABLE_DUMP_V2 PEER_INDEX_TABLE (RFC 6396 §4.3.1) → [(addr, as)]."""
    p = 4  # collector BGP ID
    vlen = struct.unpack(">H", body[p : p + 2])[0]
    p += 2 + vlen  # view name
    count = struct.unpack(">H", body[p : p + 2])[0]
    p += 2
    peers = []
    for _ in range(count):
        ptype = body[p]
        p += 1 + 4  # type + BGP ID
        if ptype & 0x1:  # IPv6 peer address
            addr = _v6_str(body[p : p + 16])
            p += 16
        else:
            addr = _v4_str(struct.unpack(">I", body[p : p + 4])[0])
            p += 4
        if ptype & 0x2:  # 4-byte AS
            asn = struct.unpack(">I", body[p : p + 4])[0]
            p += 4
        else:
            asn = struct.unpack(">H", body[p : p + 2])[0]
            p += 2
        peers.append((addr, asn))
    return peers


def _parse_td2_rib(body: bytes, subtype: int, peers: list[tuple[str, int]]):
    """TABLE_DUMP_V2 RIB_IPV4/IPV6_UNICAST[_ADDPATH] (RFC 6396 §4.3.2,
    RFC 8050): a full-RIB snapshot entry per (prefix, peer[, path]). One
    'update' row each, ts = the entry's originated time — feeding these
    through build_history reconstructs the RIB exactly like replaying the
    original updates (src/bgprib.rs snapshot load analog)."""
    import datetime as dt

    v6 = subtype in (TD2_RIB_IPV6_UNICAST, TD2_RIB_IPV6_UNICAST_ADDPATH)
    addpath = subtype in (TD2_RIB_IPV4_UNICAST_ADDPATH, TD2_RIB_IPV6_UNICAST_ADDPATH)
    width = 16 if v6 else 4
    p = 4  # sequence number
    plen = body[p]
    p += 1
    nbytes = (plen + 7) // 8
    raw = body[p : p + nbytes] + b"\x00" * (width - nbytes)
    p += nbytes
    key = _v6_key(raw, plen) if v6 else _v4_key(struct.unpack(">I", raw)[0], plen)
    count = struct.unpack(">H", body[p : p + 2])[0]
    p += 2
    for _ in range(count):
        if p + 8 > len(body):
            break
        peer_idx, orig_time = struct.unpack(">HI", body[p : p + 6])
        p += 6
        path_id = 0
        if addpath:
            path_id = struct.unpack(">I", body[p : p + 4])[0]
            p += 4
        alen = struct.unpack(">H", body[p : p + 2])[0]
        p += 2
        attrs = _parse_attrs(body, p, p + alen, as4=True, table_dump=True)
        p += alen
        if peer_idx >= len(peers):
            continue
        peer_addr, peer_as = peers[peer_idx]
        ts = dt.datetime.fromtimestamp(orig_time, tz=dt.timezone.utc).replace(
            tzinfo=None
        )
        yield _emit(ts, peer_addr, peer_as, "update", key, attrs, path_id)


def _parse_td2_generic(body: bytes, peers: list[tuple[str, int]]):
    """TABLE_DUMP_V2 RIB_GENERIC (RFC 6396 §4.3.3): full-RIB snapshot
    entries for ANY (afi, safi) — the archival form of the VPN/EVPN/...
    families, keyed through the same _decode_mp_nlri dispatch the live
    walk uses."""
    import datetime as dt

    p = 4  # sequence number
    if p + 3 > len(body):
        return
    afi, safi = struct.unpack(">HB", body[p : p + 3])
    p += 3
    try:
        elen = _mp_entry_len(afi, safi, body, p)
    except (IndexError, struct.error):
        return
    decoded = _decode_mp_nlri(afi, safi, body, p, p + elen, addpath=False)
    if not decoded:
        return
    key, _pid = decoded[0]
    p += elen
    if p + 2 > len(body):
        return
    count = struct.unpack(">H", body[p : p + 2])[0]
    p += 2
    for _ in range(count):
        if p + 8 > len(body):
            break
        peer_idx, orig_time = struct.unpack(">HI", body[p : p + 6])
        p += 6
        alen = struct.unpack(">H", body[p : p + 2])[0]
        p += 2
        attrs = _parse_attrs(body, p, p + alen, as4=True, table_dump=True)
        p += alen
        if peer_idx >= len(peers):
            continue
        peer_addr, peer_as = peers[peer_idx]
        ts = dt.datetime.fromtimestamp(orig_time, tz=dt.timezone.utc).replace(
            tzinfo=None
        )
        yield _emit(ts, peer_addr, peer_as, "update", key, attrs, 0)


def parse_mrt(data: bytes) -> Iterator[dict]:
    """One MRT byte stream → decoded update/withdraw rows (MRT_SCHEMA
    field order). Handles BGP4MP[-ET] MESSAGE[_AS4][_ADDPATH] updates and
    TABLE_DUMP_V2 RIB snapshots (peer index + v4/v6 unicast[+addpath]).
    Pure function of the bytes — runs identically on every executor; the
    PEER_INDEX_TABLE that RIB records reference is always earlier in the
    same file (RFC 6396 §4.3)."""
    off, n = 0, len(data)
    peers: list[tuple[str, int]] = []

    def safe(gen):
        # one corrupt record must not abort the file (nor, downstream,
        # its whole Arrow batch in read_mrt): a truncated body raising
        # mid-walk skips the REST of that record only — same discipline
        # as the media decoders' never-raise guarantee
        try:
            yield from gen
        except (IndexError, struct.error, ValueError, OverflowError,
                OSError):
            return

    while off + 12 <= n:
        ts_sec, mtype, subtype, length = struct.unpack(
            ">IHHI", data[off : off + 12]
        )
        off += 12
        body = data[off : off + length]
        off += length
        if mtype == MRT_TABLE_DUMP:
            yield from safe(_parse_td1(body, subtype))
            continue
        if mtype == MRT_TABLE_DUMP_V2:
            if subtype == TD2_PEER_INDEX_TABLE:
                try:
                    peers = _parse_peer_index(body)
                except (IndexError, struct.error, ValueError):
                    peers = []
            elif subtype in (
                TD2_RIB_IPV4_UNICAST, TD2_RIB_IPV6_UNICAST,
                TD2_RIB_IPV4_UNICAST_ADDPATH, TD2_RIB_IPV6_UNICAST_ADDPATH,
            ):
                yield from safe(_parse_td2_rib(body, subtype, peers))
            elif subtype == TD2_RIB_GENERIC:
                yield from safe(_parse_td2_generic(body, peers))
            continue
        if mtype not in (MRT_BGP4MP, MRT_BGP4MP_ET):
            continue
        if subtype not in (
            BGP4MP_MESSAGE, BGP4MP_MESSAGE_AS4,
            BGP4MP_MESSAGE_ADDPATH, BGP4MP_MESSAGE_AS4_ADDPATH,
        ):
            continue
        yield from safe(_parse_bgp4mp(body, ts_sec, mtype, subtype))


def read_mrt(spark: SparkSession, path: str) -> DataFrame:
    """MRT file(s) → MRT_SCHEMA DataFrame. ``binaryFile`` ships whole
    files to executors (per-file parallelism — the archives' natural
    unit); an Arrow-batched ``mapInPandas`` runs the pure-Python record
    walk. No shuffle."""
    import pandas as pd

    names = [f.name for f in MRT_FIELDS]

    def decode(batches):
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                rows.extend(parse_mrt(bytes(content)))
            yield pd.DataFrame(rows, columns=names) if rows else pd.DataFrame(
                columns=names
            )

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(decode, MRT_SCHEMA)


def mrt_peers(spark: SparkSession, path: str) -> DataFrame:
    """Distinct (peer_addr, peer_as) of an archive — the sessions
    dimension scan. Runs the SAME record walk as read_mrt (identical
    peer visibility: a peer appears iff at least one of its records
    emits a row) but reduces to the per-file distinct set executor-side,
    so the global distinct shuffles a peers-sized — not archive-sized —
    set and nothing full-width crosses Arrow. This is the cheap second
    pass assign_sessions needs: without it the sessions dimension
    re-decodes AND re-shuffles the whole archive."""
    import pandas as pd

    def scan(batches):
        for pdf in batches:
            pairs = set()
            for content in pdf["content"]:
                for r in parse_mrt(bytes(content)):
                    pairs.add((r["peer_addr"], r["peer_as"]))
            yield pd.DataFrame(
                sorted(pairs), columns=["peer_addr", "peer_as"]
            ) if pairs else pd.DataFrame(columns=["peer_addr", "peer_as"])

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(
        scan, "peer_addr string, peer_as long"
    ).distinct()


def assign_sessions(
    mrt_df: DataFrame, peers_df: DataFrame | None = None
) -> tuple[DataFrame, DataFrame]:
    """(peer_addr, peer_as) → dense session_id; returns (updates in
    UPDATES_SCHEMA order, sessions dimension). The dimension is tiny (one
    row per peer) so the id join broadcasts; ordering by (peer_addr,
    peer_as) makes the ids deterministic.

    ``peers_df``: pass ``mrt_peers(spark, path)`` when the source path is
    known — the dimension then builds from a peers-sized scan instead of
    a full-width distinct over the decoded archive (which re-runs the
    whole decode AND shuffles every row a second time)."""
    from bgpexplorer_spark.operators.sessions import dense_ids

    peers = dense_ids(
        (peers_df if peers_df is not None
         else mrt_df.select("peer_addr", "peer_as").distinct()),
        ["peer_addr", "peer_as"],
    )
    upd = (
        mrt_df.join(F.broadcast(peers), ["peer_addr", "peer_as"])
        .select(*[f.name for f in UPDATES_SCHEMA.fields])
    )
    sessions = peers.select(
        "session_id",
        F.col("peer_addr").alias("peer1_addr"),
        F.col("peer_as").alias("peer1_as"),
        F.lit(None).cast("string").alias("peer2_addr"),
        F.lit(None).cast("long").alias("peer2_as"),
    )
    return upd, sessions


# ---------------------------------------------------------------------------
# Fixture encoder — the inverse wire format, used by tests and the MRT
# contract query to build deterministic dumps. Kept in-package so the
# decode path can be exercised anywhere without network access.
# ---------------------------------------------------------------------------


def _prefix_bytes(addr: int | bytes, plen: int, v6: bool) -> bytes:
    nbytes = (plen + 7) // 8
    raw = addr if v6 else struct.pack(">I", addr)
    return bytes([plen]) + raw[:nbytes]


def encode_bgp_update_body(
    *,
    nlri: list[tuple[int, int]] | None = None,
    withdrawn: list[tuple[int, int]] | None = None,
    nlri6: list[tuple[bytes, int]] | None = None,
    withdrawn6: list[tuple[bytes, int]] | None = None,
    origin: int | None = None,
    aspath: list[tuple[int, list[int]]] | None = None,
    nexthop: int | None = None,
    nexthop6: bytes | None = None,
    med: int | None = None,
    localpref: int | None = None,
    comms: list[int] | None = None,
    aggregator: tuple[int, int] | None = None,
    originator: int | None = None,
    clusterlist: list[int] | None = None,
    extcomms: list[tuple[int, int, int, int]] | None = None,
    lcomms: list[tuple[int, int, int]] | None = None,
    addpath: bool = False,
    mp_reach: tuple[int, int, bytes, bytes] | None = None,
    mp_unreach: tuple[int, int, bytes] | None = None,
    aspath16: list[tuple[int, list[int]]] | None = None,
    as4path: list[tuple[int, list[int]]] | None = None,
    aggregator16: tuple[int, int] | None = None,
    as4aggregator: tuple[int, int] | None = None,
    pmsi: tuple[int, int, int, bytes] | None = None,
    atomicaggregate: bool = False,
) -> bytes:
    """A BGP UPDATE body (after the 19-byte message header) — shared by
    the MRT and BMP fixture encoders. With ``addpath`` the v4 prefix
    tuples are (addr, plen, path_id). extcomms entries are
    (ctype, subtype, a_u16, b_u32); lcomms are (ga, ldp1, ldp2); pmsi is
    (flags, tunnel_type, label, tunnel_id_bytes) per RFC 6514 §5."""
    attrs = b""

    def attr(atype: int, val: bytes, flags: int = 0x40) -> bytes:
        return bytes([flags, atype, len(val)]) + val

    def pfx(entry, v6: bool) -> bytes:
        # ADD-PATH applies per record (RFC 7911 + MRT _ADDPATH subtype):
        # EVERY prefix in the message — v4 NLRI and v6 MP_REACH/MP_UNREACH
        # alike — carries the 4-byte path id, defaulting to 0 for
        # entries that don't specify one.
        if addpath:
            pid = entry[2] if len(entry) == 3 else 0
            return struct.pack(">I", pid) + _prefix_bytes(
                entry[0], entry[1], v6=v6
            )
        addr, plen = entry[0], entry[1]
        return _prefix_bytes(addr, plen, v6=v6)

    if origin is not None:
        attrs += attr(1, bytes([origin]))
    if aspath is not None:
        seg = b""
        for kind, asns in aspath:
            seg += bytes([kind, len(asns)]) + b"".join(
                struct.pack(">I", x) for x in asns
            )
        attrs += attr(2, seg)
    if aspath16 is not None:
        # 2-octet session form (AS_TRANS placeholders, RFC 6793)
        seg = b""
        for kind, asns in aspath16:
            seg += bytes([kind, len(asns)]) + b"".join(
                struct.pack(">H", x) for x in asns
            )
        attrs += attr(2, seg)
    if as4path is not None:
        seg = b""
        for kind, asns in as4path:
            seg += bytes([kind, len(asns)]) + b"".join(
                struct.pack(">I", x) for x in asns
            )
        attrs += attr(17, seg, flags=0xC0)
    if aggregator16 is not None:
        attrs += attr(7, struct.pack(">HI", *aggregator16))
    if as4aggregator is not None:
        attrs += attr(18, struct.pack(">II", *as4aggregator), flags=0xC0)
    if nexthop is not None:
        attrs += attr(3, struct.pack(">I", nexthop))
    if med is not None:
        attrs += attr(4, struct.pack(">I", med))
    if localpref is not None:
        attrs += attr(5, struct.pack(">I", localpref))
    if atomicaggregate:
        attrs += attr(6, b"")
    if aggregator is not None:
        attrs += attr(7, struct.pack(">II", aggregator[0], aggregator[1]))
    if comms is not None:
        attrs += attr(8, b"".join(struct.pack(">I", c) for c in comms))
    if originator is not None:
        attrs += attr(9, struct.pack(">I", originator))
    if clusterlist is not None:
        attrs += attr(10, b"".join(struct.pack(">I", c) for c in clusterlist))
    if extcomms is not None:
        attrs += attr(
            16,
            b"".join(
                bytes([ct, st]) + struct.pack(">HI", a, b)
                for ct, st, a, b in extcomms
            ),
        )
    if lcomms is not None:
        attrs += attr(
            32, b"".join(struct.pack(">III", ga, l1, l2) for ga, l1, l2 in lcomms)
        )
    if pmsi is not None:
        pflags, ptype, plabel, ptid = pmsi
        lab3 = (plabel << 4).to_bytes(3, "big")
        attrs += attr(22, bytes([pflags, ptype]) + lab3 + ptid, flags=0xC0)
    if nlri6 is not None:
        # nhlen=0 is legal MP_REACH and round-trips "no nexthop" exactly
        nh6 = nexthop6 or b""
        body6 = struct.pack(">HBB", 2, 1, len(nh6)) + nh6 + b"\x00"
        for entry in nlri6:
            body6 += pfx(entry, v6=True)
        attrs += attr(14, body6, flags=0x80)
    if withdrawn6 is not None:
        body6 = struct.pack(">HB", 2, 1)
        for entry in withdrawn6:
            body6 += pfx(entry, v6=True)
        attrs += attr(15, body6, flags=0x80)
    if mp_reach is not None:
        # raw-payload form for the non-v6u families: (afi, safi,
        # nexthop bytes, NLRI payload built by the per-family helpers)
        afi, safi, nh, payload = mp_reach
        attrs += attr(
            14,
            struct.pack(">HBB", afi, safi, len(nh)) + nh + b"\x00" + payload,
            flags=0x80,
        )
    if mp_unreach is not None:
        afi, safi, payload = mp_unreach
        attrs += attr(15, struct.pack(">HB", afi, safi) + payload, flags=0x80)

    wd = b"".join(pfx(e, v6=False) for e in (withdrawn or []))
    nl = b"".join(pfx(e, v6=False) for e in (nlri or []))
    return struct.pack(">H", len(wd)) + wd + struct.pack(">H", len(attrs)) + attrs + nl


def encode_update(ts_sec: int, peer_as: int, peer_ip: int, **kw) -> bytes:
    """One BGP4MP_MESSAGE_AS4[_ADDPATH] MRT record wrapping a BGP UPDATE
    (body kwargs per encode_bgp_update_body)."""
    addpath = kw.get("addpath", False)
    upd_body = encode_bgp_update_body(**kw)
    bgp_msg = b"\xff" * 16 + struct.pack(">HB", 19 + len(upd_body), 2) + upd_body

    b4 = (
        struct.pack(">II", peer_as, 65001)  # peer_as, local_as
        + struct.pack(">HH", 0, 1)  # ifindex, AFI v4
        + struct.pack(">II", peer_ip, 0x0A00FF01)  # peer ip, local ip
        + bgp_msg
    )
    sub = BGP4MP_MESSAGE_AS4_ADDPATH if addpath else BGP4MP_MESSAGE_AS4
    return struct.pack(">IHHI", ts_sec, MRT_BGP4MP, sub, len(b4)) + b4


def encode_peer_index(peers: list[tuple[int, int]]) -> bytes:
    """TABLE_DUMP_V2 PEER_INDEX_TABLE: peers = [(peer_ip_v4_int, peer_as)]
    (4-byte AS, v4 address form)."""
    body = struct.pack(">I", 0x0A0A0A0A) + struct.pack(">H", 0)  # BGP id, view ''
    body += struct.pack(">H", len(peers))
    for ip, asn in peers:
        body += bytes([0x2]) + struct.pack(">I", 0x01020304)  # type: AS4+v4, BGP id
        body += struct.pack(">I", ip) + struct.pack(">I", asn)
    return struct.pack(">IHHI", 0, MRT_TABLE_DUMP_V2, TD2_PEER_INDEX_TABLE, len(body)) + body


def encode_td2_rib_v4(
    seq: int,
    addr: int,
    plen: int,
    entries: list[dict],
    addpath: bool = False,
) -> bytes:
    """TABLE_DUMP_V2 RIB_IPV4_UNICAST[_ADDPATH]: entries are dicts with
    peer_idx, orig_time, optional path_id, and the TABLE_DUMP attr fields
    (origin int, aspath segs, nexthop int)."""
    body = struct.pack(">I", seq) + _prefix_bytes(addr, plen, v6=False)
    body += struct.pack(">H", len(entries))
    for e in entries:
        attrs = b""
        if "origin" in e:
            attrs += bytes([0x40, 1, 1, e["origin"]])
        if "aspath" in e:
            seg = b""
            for kind, asns in e["aspath"]:
                seg += bytes([kind, len(asns)]) + b"".join(
                    struct.pack(">I", x) for x in asns
                )
            attrs += bytes([0x40, 2, len(seg)]) + seg
        if "nexthop" in e:
            attrs += bytes([0x40, 3, 4]) + struct.pack(">I", e["nexthop"])
        if "med" in e:
            attrs += bytes([0x80, 4, 4]) + struct.pack(">I", e["med"])
        if "localpref" in e:
            attrs += bytes([0x40, 5, 4]) + struct.pack(">I", e["localpref"])
        if "comms" in e:
            cb = b"".join(struct.pack(">I", c) for c in e["comms"])
            attrs += bytes([0xC0, 8, len(cb)]) + cb
        body += struct.pack(">HI", e["peer_idx"], e["orig_time"])
        if addpath:
            body += struct.pack(">I", e.get("path_id", 0))
        body += struct.pack(">H", len(attrs)) + attrs
    sub = TD2_RIB_IPV4_UNICAST_ADDPATH if addpath else TD2_RIB_IPV4_UNICAST
    return struct.pack(">IHHI", 0, MRT_TABLE_DUMP_V2, sub, len(body)) + body


# --- BGP4MP_STATE_CHANGE (RFC 6396 §4.4.1) ----------------------------------

BGP4MP_STATE_CHANGE = 0
BGP4MP_STATE_CHANGE_AS4 = 5

# BGP FSM states (RFC 4271 §8)
FSM_STATES = {
    1: "Idle", 2: "Connect", 3: "Active",
    4: "OpenSent", 5: "OpenConfirm", 6: "Established",
}

STATE_CHANGES_SCHEMA = (
    "peer_addr string, peer_as bigint, ts timestamp, "
    "old_state int, new_state int"
)


def parse_mrt_state_changes(data: bytes) -> Iterator[dict]:
    """BGP4MP[-ET] STATE_CHANGE[_AS4] records → FSM transition rows —
    the session-lifecycle signal of an MRT update archive (the BMP
    analog is Peer Up/Down, sources/bmp.py)."""
    import datetime as dt

    off, n = 0, len(data)
    while off + 12 <= n:
        ts_sec, mtype, subtype, length = struct.unpack(
            ">IHHI", data[off : off + 12]
        )
        body = data[off + 12 : off + 12 + length]
        off += 12 + length
        if mtype not in (MRT_BGP4MP, MRT_BGP4MP_ET):
            continue
        if subtype not in (BGP4MP_STATE_CHANGE, BGP4MP_STATE_CHANGE_AS4):
            continue
        p = 0
        usec = 0
        if mtype == MRT_BGP4MP_ET:
            if len(body) < 4:  # truncated ET frame: skip, don't abort file
                continue
            usec = struct.unpack(">I", body[:4])[0]
            p = 4
        as4 = subtype == BGP4MP_STATE_CHANGE_AS4
        asz = 4 if as4 else 2
        afmt = ">I" if as4 else ">H"
        if p + 2 * asz + 4 > len(body):
            continue
        peer_as = struct.unpack(afmt, body[p : p + asz])[0]
        p += 2 * asz + 2  # peer_as + local_as + ifindex
        afi = struct.unpack(">H", body[p : p + 2])[0]
        p += 2
        ipw = 4 if afi == 1 else 16
        if p + 2 * ipw + 4 > len(body):
            continue
        raw = body[p : p + ipw]
        peer_addr = _v4_str(struct.unpack(">I", raw)[0]) if afi == 1 else _v6_str(raw)
        p += 2 * ipw  # peer + local address
        old_state, new_state = struct.unpack(">HH", body[p : p + 4])
        ts = dt.datetime.fromtimestamp(
            ts_sec + usec / 1e6, tz=dt.timezone.utc
        ).replace(tzinfo=None)
        yield {
            "peer_addr": peer_addr, "peer_as": peer_as, "ts": ts,
            "old_state": old_state, "new_state": new_state,
        }


def read_mrt_state_changes(spark: SparkSession, path: str) -> DataFrame:
    """MRT archive → FSM transition DataFrame (per-file parallel decode,
    same binaryFile + mapInPandas shape as read_mrt)."""
    import pandas as pd

    cols = [c.split()[0].strip() for c in STATE_CHANGES_SCHEMA.split(",")]

    def decode(batches):
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                rows.extend(parse_mrt_state_changes(bytes(content)))
            yield pd.DataFrame(rows, columns=cols) if rows else pd.DataFrame(
                columns=cols
            )

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(decode, STATE_CHANGES_SCHEMA)


def encode_state_change(
    ts_sec: int, peer_as: int, peer_ip: int, old_state: int, new_state: int
) -> bytes:
    """One BGP4MP_STATE_CHANGE_AS4 record (fixture encoder)."""
    b4 = (
        struct.pack(">II", peer_as, 65001)
        + struct.pack(">HH", 0, 1)
        + struct.pack(">II", peer_ip, 0x0A00FF01)
        + struct.pack(">HH", old_state, new_state)
    )
    return struct.pack(
        ">IHHI", ts_sec, MRT_BGP4MP, BGP4MP_STATE_CHANGE_AS4, len(b4)
    ) + b4


# --- TABLE_DUMP v1 (RFC 6396 §5.1) — the legacy full-RIB archive form -------

MRT_TABLE_DUMP = 12


def _parse_td1(body: bytes, subtype: int):
    """One TABLE_DUMP (v1) record → one 'update' row. Subtype is the AFI
    (1 v4 / 2 v6); addresses are full-width, AS numbers 16-bit, and the
    attribute walk runs with 2-byte ASNs (pre-AS4 archives). ts = the
    entry's originated time, like the TD2 walk — replaying through
    build_history reconstructs the RIB."""
    import datetime as dt

    v6 = subtype == 2
    width = 16 if v6 else 4
    p = 4  # view number + sequence
    # fixed fields after view+seq: prefix w + plen 1 + status 1 + orig 4
    # + peer w + AS 2 + attrlen 2 = 2w+10 (attr bytes guarded separately)
    if len(body) < p + 2 * width + 10:
        return
    raw = body[p : p + width]
    p += width
    plen = body[p]
    p += 2  # prefix length + status
    orig_time = struct.unpack(">I", body[p : p + 4])[0]
    p += 4
    peer_raw = body[p : p + width]
    p += width
    peer_as, alen = struct.unpack(">HH", body[p : p + 4])
    p += 4
    if p + alen > len(body):
        return
    attrs = _parse_attrs(body, p, p + alen, as4=False, table_dump=True)
    key = _v6_key(raw, plen) if v6 else _v4_key(struct.unpack(">I", raw)[0], plen)
    peer_addr = _v6_str(peer_raw) if v6 else _v4_str(struct.unpack(">I", peer_raw)[0])
    ts = dt.datetime.fromtimestamp(orig_time, tz=dt.timezone.utc).replace(tzinfo=None)
    yield _emit(ts, peer_addr, peer_as, "update", key, attrs, 0)


def encode_td1_v4(
    seq: int, prefix: int, plen: int, orig_time: int, peer_ip: int,
    peer_as: int, origin: int, aspath2: list[int], nexthop: int,
) -> bytes:
    """One TABLE_DUMP v1 IPv4 record (fixture encoder): ORIGIN + 2-byte
    AS_PATH (one Seq segment) + NEXT_HOP attributes."""
    attrs = bytes([0x40, 1, 1, origin])
    seg = bytes([2, len(aspath2)]) + b"".join(
        struct.pack(">H", a) for a in aspath2
    )
    attrs += bytes([0x40, 2, len(seg)]) + seg
    attrs += bytes([0x40, 3, 4]) + struct.pack(">I", nexthop)
    body = (
        struct.pack(">HH", 0, seq)
        + struct.pack(">I", prefix)
        + bytes([plen, 1])
        + struct.pack(">I", orig_time)
        + struct.pack(">I", peer_ip)
        + struct.pack(">HH", peer_as, len(attrs))
        + attrs
    )
    return struct.pack(">IHHI", orig_time, MRT_TABLE_DUMP, 1, len(body)) + body


# --- multiprotocol fixture encoders (inverses of _decode_mp_nlri) ----------


def encode_rd(hi: int, lo: int) -> bytes:
    """(rd_hi, rd_lo) numeric layout → 8-byte wire RD (type 1 when the
    IP-form marker is set, else type 0)."""
    if hi & _RD_IP_FLAG:
        ip = ((hi & 0xFFFF) << 16) | (lo >> 16)
        return struct.pack(">HIH", 1, ip, lo & 0xFFFF)
    return struct.pack(">HHI", 0, hi, lo)


def _enc_labels(labels: "list[int]") -> bytes:
    out = b""
    for i, l in enumerate(labels):
        v = (l << 4) | (1 if i == len(labels) - 1 else 0)
        out += bytes([(v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF])
    return out


def encode_labeled_nlri(
    labels: "list[int]", addr, plen: int, v6: bool = False,
    rd: "tuple[int, int] | None" = None, path_id: "int | None" = None,
) -> bytes:
    """RFC 8277 / RFC 4364 NLRI entry: bit length + label stack
    [+ RD] + prefix. ``addr``: int (v4) or bytes (v6)."""
    lab = _enc_labels(labels)
    rdb = encode_rd(*rd) if rd else b""
    pfx = (
        addr[: (plen + 7) // 8] if v6
        else struct.pack(">I", addr)[: (plen + 7) // 8]
    )
    bits = (len(lab) + len(rdb)) * 8 + plen
    head = struct.pack(">I", path_id) if path_id is not None else b""
    return head + bytes([bits]) + lab + rdb + pfx


def encode_mdt_nlri(rd: "tuple[int, int]", source, group, v6: bool = False) -> bytes:
    src = source if v6 else struct.pack(">I", source)
    grp = group if v6 else struct.pack(">I", group)
    body = encode_rd(*rd) + src + grp
    return bytes([min(len(body) * 8, 255)]) + body


def encode_vpls_nlri(
    rd: "tuple[int, int]", ve_id: int, offset: int, vrange: int,
    label_base: int,
) -> bytes:
    body = (
        encode_rd(*rd) + struct.pack(">HHH", ve_id, offset, vrange)
        + _enc_labels([label_base])[:3]
    )
    return struct.pack(">H", len(body)) + body


def encode_evpn_nlri(rtype: int, rd: "tuple[int, int]", **kw) -> bytes:
    """EVPN route (RFC 7432 §7): type 2 (MAC/IP, kw: mac, ip, label),
    type 3 (IMET, kw: ip), type 5 (prefix, kw: ip, plen)."""
    rdb = encode_rd(*rd)
    if rtype == 2:
        ip = kw.get("ip", b"")
        body = (
            rdb + bytes(10) + struct.pack(">I", kw.get("ethtag", 0))
            + bytes([48]) + kw.get("mac", bytes(6))
            + bytes([len(ip) * 8]) + ip + _enc_labels([kw.get("label", 0)])
        )
    elif rtype == 3:
        ip = kw.get("ip", b"")
        body = rdb + struct.pack(">I", kw.get("ethtag", 0)) + bytes([len(ip) * 8]) + ip
    elif rtype == 5:
        ip, plen = kw.get("ip", bytes(4)), kw.get("plen", 0)
        width = 16 if len(ip) > 4 else 4
        gw = kw.get("gw", ip.ljust(width, b"\x00"))
        body = (
            rdb + bytes(10) + struct.pack(">I", kw.get("ethtag", 0))
            + bytes([plen]) + ip[: (plen + 7) // 8]
            + gw + _enc_labels([kw.get("label", 0)])
        )
    else:
        body = rdb + kw.get("body", b"")
    return bytes([rtype, len(body)]) + body


def encode_mvpn_nlri(rtype: int, rd: "tuple[int, int]", **kw) -> bytes:
    """MVPN route (RFC 6514 §4): type 1 (kw: originator), type 3
    (kw: source, group, originator), type 4 (kw: spmsi — the embedded
    type-3 route bytes — and originator), type 5 (kw: source, group),
    types 6/7 (kw: source_as, source, group). Addresses are v4 ints."""
    rdb = encode_rd(*rd)
    if rtype == 1:
        body = rdb + struct.pack(">I", kw["originator"])
    elif rtype == 3:
        body = (
            rdb + bytes([32]) + struct.pack(">I", kw["source"])
            + bytes([32]) + struct.pack(">I", kw["group"])
            + struct.pack(">I", kw["originator"])
        )
    elif rtype == 4:
        body = kw["spmsi"] + struct.pack(">I", kw["originator"])
        return bytes([4, len(body)]) + body
    elif rtype == 5:
        body = (
            rdb + bytes([32]) + struct.pack(">I", kw["source"])
            + bytes([32]) + struct.pack(">I", kw["group"])
        )
    elif rtype in (6, 7):
        body = (
            rdb + struct.pack(">I", kw.get("source_as", 0))
            + bytes([32]) + struct.pack(">I", kw["source"])
            + bytes([32]) + struct.pack(">I", kw["group"])
        )
    else:
        body = rdb + kw.get("body", b"")
    return bytes([rtype, len(body)]) + body


def encode_flowspec_nlri(dst_addr: int, dst_plen: int, extra: bytes = b"") -> bytes:
    comp = bytes([1, dst_plen]) + struct.pack(">I", dst_addr)[: (dst_plen + 7) // 8] + extra
    return bytes([len(comp)]) + comp


def _mp_entry_len(afi: int, safi: int, buf: bytes, p: int) -> int:
    """Wire length of ONE MP NLRI entry at ``p`` (every family is
    self-delimiting) — used by TABLE_DUMP_V2 RIB_GENERIC, whose header
    embeds a single entry with no explicit length (RFC 6396 §4.3.3)."""
    if afi == 25 and safi == 65:  # VPLS: 2-byte length prefix
        return 2 + struct.unpack(">H", buf[p : p + 2])[0]
    if (afi == 25 and safi == 70) or (afi == 1 and safi == 5):
        return 2 + buf[p + 1]  # EVPN / MVPN: type + len + body
    if afi in (1, 2) and safi == 66:  # MDT: fixed-size body
        asz = 16 if afi == 2 else 4
        return 1 + max((buf[p] + 7) // 8, 8 + 2 * asz) if afi == 1 else 1 + 8 + 2 * asz
    if afi == 1 and safi == 133:  # FlowSpec: 1- or 2-byte length
        flen = buf[p]
        if flen >= 0xF0:
            return 2 + (((flen & 0x0F) << 8) | buf[p + 1])
        return 1 + flen
    return 1 + (buf[p] + 7) // 8  # prefix-based families: bit length


def encode_td2_generic(
    seq: int, afi: int, safi: int, nlri_entry: bytes, entries: list[dict],
) -> bytes:
    """TABLE_DUMP_V2 RIB_GENERIC (RFC 6396 §4.3.3): one MP-format NLRI
    entry (built by the per-family encoders) + RIB entries with the
    TABLE_DUMP attr form."""
    body = struct.pack(">I", seq) + struct.pack(">HB", afi, safi) + nlri_entry
    body += struct.pack(">H", len(entries))
    for e in entries:
        attrs = b""
        if "origin" in e:
            attrs += bytes([0x40, 1, 1, e["origin"]])
        if "aspath" in e:
            seg = b""
            for kind, asns in e["aspath"]:
                seg += bytes([kind, len(asns)]) + b"".join(
                    struct.pack(">I", x) for x in asns
                )
            attrs += bytes([0x40, 2, len(seg)]) + seg
        if "nexthop" in e:
            attrs += bytes([0x40, 3, 4]) + struct.pack(">I", e["nexthop"])
        body += struct.pack(">HI", e["peer_idx"], e["orig_time"])
        body += struct.pack(">H", len(attrs)) + attrs
    return struct.pack(
        ">IHHI", 0, MRT_TABLE_DUMP_V2, TD2_RIB_GENERIC, len(body)) + body


def write_mrt(df: DataFrame, out_dir: str) -> DataFrame:
    """MRT_SCHEMA rows → BGP4MP_MESSAGE_AS4[_ADDPATH] MRT files — the
    archival EXPORT path (read_mrt's inverse): one record per row, one
    file per partition, written executor-side via tmp+rename so a
    failed task never leaves a partial archive visible.

    v4 and v6 unicast rows (incl. ADD-PATH ids and the full scalar attr
    set: origin, AS path Seq/Set, nexthop, MED, localpref, communities,
    ext/large communities, atomic-aggregate, aggregator AS (the address
    is not stored engine-side and re-encodes as 0.0.0.0), originator,
    cluster list, PMSI) encode losslessly; rows of the decorated-key
    families or with
    non-v4 peers are SKIPPED and counted — emitting a half-faithful
    record would corrupt an archive rather than export it.

    Returns the manifest (file, n_records, n_skipped) — an action on it
    drives the write, mirroring how the parquet sinks behave."""
    import os
    import uuid

    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    names = [f.name for f in MRT_FIELDS]
    origin_codes = {"IGP": 0, "EGP": 1, "Incomplete": 2}

    def _has(v) -> bool:
        # pandas renders nullable scalars as NaN, not None
        if v is None:
            return False
        if isinstance(v, float) and v != v:
            return False
        return True

    def _encode_row(r: dict) -> bytes | None:
        peer = r["peer_addr"]
        if not _has(peer) or ":" in peer:
            return None
        peer_ip = 0
        for part in peer.split("."):
            peer_ip = (peer_ip << 8) | int(part)
        ts_sec = int(pd.Timestamp(r["ts"]).timestamp())
        pid = int(r["path_id"]) if _has(r["path_id"]) else 0
        kw: dict = {}
        if r["rib"] == "ipv4u":
            entry = (int(r["addr_v4"]), int(r["prefixlen"]))
            if pid:
                kw["addpath"] = True
                entry = entry + (pid,)
            kw["nlri" if r["op"] == "update" else "withdrawn"] = [entry]
        elif r["rib"] == "ipv6u":
            entry6 = (bytes(r["addr_v6"]), int(r["prefixlen"]))
            if pid:
                # ADD-PATH is per-record, so v6 path ids ride the same
                # _ADDPATH subtype as v4 (read_mrt emits them for
                # BGP4MP_ADDPATH / TD2 v6 addpath records)
                kw["addpath"] = True
                entry6 = entry6 + (pid,)
            kw["nlri6" if r["op"] == "update" else "withdrawn6"] = [entry6]
            if r["op"] == "update" and _has(r["nexthop_v6"]):
                kw["nexthop6"] = bytes(r["nexthop_v6"])
        else:
            return None
        if r["op"] == "update":
            if _has(r["origin"]):
                kw["origin"] = origin_codes.get(r["origin"], 2)
            if _has(r["aspath"]):
                kw["aspath"] = [
                    (1 if s["kind"] == "Set" else 2, [int(a) for a in s["asns"]])
                    for s in r["aspath"]
                ]
            if r["rib"] == "ipv4u" and _has(r["nexthop_v4"]):
                kw["nexthop"] = int(r["nexthop_v4"])
            if _has(r["med"]):
                kw["med"] = int(r["med"])
            if _has(r["localpref"]):
                kw["localpref"] = int(r["localpref"])
            if _has(r["comms"]):
                kw["comms"] = [int(c) for c in r["comms"]]
            if _has(r["atomicaggregate"]) and r["atomicaggregate"]:
                kw["atomicaggregate"] = True
            if _has(r["aggregator_as"]):
                # the engine stores only the aggregator AS (read_mrt
                # drops the address); re-encode attr 7 with 0.0.0.0 so
                # the AS survives the archive instead of being lost
                kw["aggregator"] = (int(r["aggregator_as"]), 0)
            if _has(r["originator"]):
                kw["originator"] = int(r["originator"])
            if _has(r["clusterlist"]):
                kw["clusterlist"] = [int(c) for c in r["clusterlist"]]
            if _has(r["extcomms"]):
                # struct fields arrive as pandas floats when any row of
                # the batch is null-bearing — coerce back to ints
                kw["extcomms"] = [
                    (int(e["ctype"]), int(e["subtype"]), int(e["a"]), int(e["b"]))
                    for e in r["extcomms"]
                ]
            if _has(r["lcomms"]):
                kw["lcomms"] = [
                    (int(c["ga"]), int(c["ldp1"]), int(c["ldp2"]))
                    for c in r["lcomms"]
                ]
            p = r["pmsi_ta"]
            if _has(p):
                kw["pmsi"] = (
                    int(p["flags"]), int(p["tunnel_type"]), int(p["label"]),
                    bytes(p["tunnel_id"]) if p["tunnel_id"] is not None else b"",
                )
        return encode_update(
            ts_sec=ts_sec, peer_as=int(r["peer_as"]), peer_ip=peer_ip, **kw
        )

    def _write(batches):
        blob = bytearray()
        n_rec = n_skip = 0
        for pdf in batches:
            for r in pdf.sort_values("ts").to_dict("records"):
                rec = _encode_row(r)
                if rec is None:
                    n_skip += 1
                else:
                    blob += rec
                    n_rec += 1
        if n_rec or n_skip:
            path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.mrt")
            if n_rec:
                tmp = path + ".part"
                with open(tmp, "wb") as f:
                    f.write(bytes(blob))
                os.replace(tmp, path)
            yield pd.DataFrame(
                [{"file": path if n_rec else None,
                  "n_records": n_rec, "n_skipped": n_skip}]
            )

    return df.select(*names).mapInPandas(
        _write, "file string, n_records long, n_skipped long"
    )


def _encode_rib_partition(
    pdf_iter, sess_to_idx: dict[int, int]
) -> tuple[bytes, int, int, int]:
    """Encode one state partition (an iterator of pandas batches, the
    exact shape mapInPandas delivers) as TABLE_DUMP_V2 RIB records.
    Returns (record_bytes, n_prefixes, n_entries, n_skipped).

    mapInPandas delivers a partition as MULTIPLE ~10k-row Arrow batches;
    grouping per batch would emit a prefix that straddles a batch
    boundary as two RIB records, violating TABLE_DUMP_V2's
    one-record-per-prefix shape. Concatenate the partition first — it's
    a 12-column projection already split by the (addr_v4, prefixlen)
    repartition, so it fits comfortably. Module-level so the property
    fuzz can drive it with randomized batch boundaries directly."""
    import pandas as pd

    origin_codes = {"IGP": 0, "EGP": 1, "Incomplete": 2}

    def _has(v) -> bool:
        if v is None:
            return False
        if isinstance(v, float) and v != v:
            return False
        return True

    records = bytearray()
    seq = 0
    n_pfx = n_ent = n_skip = 0
    batches = list(pdf_iter)
    if batches:
        pdf = batches[0] if len(batches) == 1 else pd.concat(
            batches, ignore_index=True
        )
        bad = pdf["rib"] != "ipv4u"
        n_skip += int(bad.sum())
        pdf = pdf[~bad]
        for (addr, plen), grp in pdf.groupby(["addr_v4", "prefixlen"]):
            entries = []
            addpath = False
            for r in grp.sort_values("session_id").to_dict("records"):
                sid = int(r["session_id"])
                if sid not in sess_to_idx:
                    n_skip += 1
                    continue
                e: dict = {
                    "peer_idx": sess_to_idx[sid],
                    "orig_time": int(pd.Timestamp(r["ts"]).timestamp()),
                }
                pid = int(r["path_id"]) if _has(r["path_id"]) else 0
                if pid:
                    e["path_id"] = pid
                    addpath = True
                if _has(r["origin"]):
                    e["origin"] = origin_codes.get(r["origin"], 2)
                if _has(r["aspath"]):
                    e["aspath"] = [
                        (1 if s["kind"] == "Set" else 2,
                         [int(a) for a in s["asns"]])
                        for s in r["aspath"]
                    ]
                if _has(r["nexthop_v4"]):
                    e["nexthop"] = int(r["nexthop_v4"])
                if _has(r["med"]):
                    e["med"] = int(r["med"])
                if _has(r["localpref"]):
                    e["localpref"] = int(r["localpref"])
                if _has(r["comms"]):
                    e["comms"] = [int(c) for c in r["comms"]]
                entries.append(e)
            if not entries:
                continue
            records += encode_td2_rib_v4(
                seq, int(addr), int(plen), entries, addpath=addpath
            )
            seq += 1
            n_pfx += 1
            n_ent += len(entries)
    return bytes(records), n_pfx, n_ent, n_skip


def write_rib_dump(
    state: DataFrame, sessions: DataFrame, out_dir: str
) -> DataFrame:
    """Active v4-unicast state → TABLE_DUMP_V2 MRT RIB dump files (the
    RouteViews/RIS interchange format; read back by the S5 decoder).

    Each output file is self-contained: the (tiny) PEER_INDEX_TABLE is
    prepended per file, then one RIB record per prefix holding all its
    per-peer entries — which is why the write repartitions on the
    prefix first: TABLE_DUMP_V2 REQUIRES a prefix's entries in one
    record, so prefix-colocation is the format's own shuffle, not an
    extra one. Sequence numbers are per-file counters (readers treat
    them as record ids, not global ordinals). Non-ipv4u rows are
    skipped and counted. Returns the manifest
    (file, n_prefixes, n_entries, n_skipped)."""
    import os
    import uuid

    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    peers = sorted(
        (int(r["session_id"]), r["peer1_addr"], int(r["peer1_as"]))
        for r in sessions.collect()
    )
    sess_to_idx: dict[int, int] = {}
    peer_list: list[tuple[int, int]] = []
    for sid, addr, asn in peers:
        if ":" in addr:
            continue  # v4-form peer index entries only
        ip = 0
        for part in addr.split("."):
            ip = (ip << 8) | int(part)
        sess_to_idx[sid] = len(peer_list)
        peer_list.append((ip, asn))
    index_bytes = encode_peer_index(peer_list)

    cols = [
        "rib", "addr_v4", "prefixlen", "session_id", "path_id", "ts",
        "origin", "aspath", "nexthop_v4", "med", "localpref", "comms",
    ]

    def _write(pdf_iter):
        records, n_pfx, n_ent, n_skip = _encode_rib_partition(
            pdf_iter, sess_to_idx
        )
        if n_pfx or n_skip:
            path = os.path.join(out_dir, f"rib-{uuid.uuid4().hex}.mrt")
            if n_pfx:
                tmp = path + ".part"
                with open(tmp, "wb") as f:
                    f.write(index_bytes + bytes(records))
                os.replace(tmp, path)
            yield pd.DataFrame(
                [{"file": path if n_pfx else None, "n_prefixes": n_pfx,
                  "n_entries": n_ent, "n_skipped": n_skip}]
            )

    return (
        state.select(*cols)
        .repartition("addr_v4", "prefixlen")
        .mapInPandas(
            _write,
            "file string, n_prefixes long, n_entries long, n_skipped long",
        )
    )
