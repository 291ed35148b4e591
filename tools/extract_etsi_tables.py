#!/usr/bin/env python3
"""Extract ETSI EN 302 755 numeric constant tables into .npz data files.

The DVB-T2 standard (ETSI EN 302 755) defines a large number of numeric
constant tables that any interoperable implementation must reproduce exactly:

* LDPC parity-bit accumulator address tables (Annex A / Annex B / Annex C)
* P2/TR PAPR reserved-carrier index tables      (Annex H, tables H.2/H.3)
* Continual-pilot group tables CP1..CP6 + extended-mode extras (Annex H.1)
* P1 active-carrier CDS table, S1/S2 CCS/MSS modulation pattern tables (§9.8)
* Frequency-interleaver bit-permutation tables  (§8.5, tables 50-55)
* Bit-to-cell demux and column-twist parameter tables (§6.3, tables 12a-16)
* The frame-level PN sequence used for pilot modulation (§9.2.2, table 41)

We cannot fetch the ETSI PDF in this offline environment; the only local
source of these standard constants is the reference implementation mounted
read-only at /root/reference (which itself copied them from the ETSI PDF, see
e.g. /root/reference/src/DVB_T2/LDPC/dvb_t2_tables.hh:1-7).  This script
parses *numeric data only* out of those files — no code or logic is taken —
and stores it as NumPy archives under sdr_receiver_dvb_t2_tpu/params/data/.

Sources (file:line ranges refer to the reference checkout):
  src/DVB_T2/dvbt2_definition.h:359-886   pn sequence, PAPR maps, CP groups, mux tables
  src/DVB_T2/p1_symbol.h:90-162           P1 CDS + S1/S2 patterns
  src/DVB_T2/address_freq_deinterleaver.h:46-99  bit permutation tables
  src/DVB_T2/llr_demapper.h:77-91         column-twist tc + demux tables
  src/DVB_T2/LDPC/dvb_t2_tables.hh        LDPC DEG/LEN/POS tables
"""
import re
import sys
import numpy as np
from pathlib import Path

REF = Path("/root/reference/src")
OUT = Path(__file__).resolve().parent.parent / "sdr_receiver_dvb_t2_tpu" / "params" / "data"
OUT.mkdir(parents=True, exist_ok=True)


def parse_int_arrays(text):
    """Find all `const <type> name[...] = { ... };` integer-array definitions."""
    out = {}
    pat = re.compile(
        r"const\s+(?:unsigned\s+char|uint8_t|int)\s+(\w+)\s*\[[^\]]*\]\s*=\s*\{(.*?)\};",
        re.S,
    )
    for m in pat.finditer(text):
        name, body = m.group(1), m.group(2)
        vals = re.findall(r"0[xX][0-9a-fA-F]+|\d+", body)
        out[name] = np.array([int(v, 0) for v in vals], dtype=np.int64)
    return out


def parse_2d_hex_arrays(text):
    """Find `const uint8_t name[R][C] = { {..},.. };` tables (S1/S2 patterns)."""
    out = {}
    pat = re.compile(
        r"const\s+uint8_t\s+(\w+)\s*\[(\d+)\]\s*\[(\d+)\]\s*=\s*\{(.*?)\n    \};",
        re.S,
    )
    for m in pat.finditer(text):
        name, r, c, body = m.group(1), int(m.group(2)), int(m.group(3)), m.group(4)
        vals = [int(v, 0) for v in re.findall(r"0[xX][0-9a-fA-F]+|\d+", body)]
        out[name] = np.array(vals, dtype=np.int64).reshape(r, c)
    return out


def extract_ldpc_tables():
    text = (REF / "DVB_T2/LDPC/dvb_t2_tables.hh").read_text()
    tables = {}
    struct_pat = re.compile(r"struct\s+(DVB_T2_TABLE_\w+)\s*\{(.*?)\n\};", re.S)
    for m in struct_pat.finditer(text):
        name, body = m.group(1), m.group(2)
        def const(field):
            mm = re.search(rf"static const int {field}\s*=\s*(\d+);", body)
            return int(mm.group(1))
        def arr(field):
            mm = re.search(rf"static constexpr int {field}\[\]\s*=\s*\{{(.*?)\}};", body, re.S)
            return np.array([int(v) for v in re.findall(r"\d+", mm.group(1))], dtype=np.int64)
        entry = dict(
            M=const("M"), N=const("N"), K=const("K"),
            LINKS_MIN_CN=const("LINKS_MIN_CN"), LINKS_MAX_CN=const("LINKS_MAX_CN"),
            LINKS_TOTAL=const("LINKS_TOTAL"), DEG_MAX=const("DEG_MAX"),
            DEG=arr("DEG"), LEN=arr("LEN"), POS=arr("POS"),
        )
        # sanity: POS length == sum(DEG_i * LEN_i)
        deg, ln = entry["DEG"], entry["LEN"]
        want = int((deg * ln).sum())
        assert len(entry["POS"]) == want, (name, len(entry["POS"]), want)
        tables[name] = entry
    return tables


def main():
    defs = parse_int_arrays((REF / "DVB_T2/dvbt2_definition.h").read_text())
    p1_text = (REF / "DVB_T2/p1_symbol.h").read_text()
    p1 = parse_int_arrays(p1_text)
    p1_2d = parse_2d_hex_arrays(p1_text)
    addr = parse_int_arrays((REF / "DVB_T2/address_freq_deinterleaver.h").read_text())
    llr = parse_int_arrays((REF / "DVB_T2/llr_demapper.h").read_text())

    carriers = {}
    # frame-level PN sequence (2624 chips packed as bytes, §9.2.2 table 41)
    carriers["pn_sequence_bytes"] = defs["pn_sequence_table"].astype(np.uint8)
    for k, v in defs.items():
        if k.startswith(("p2_papr_map_", "tr_papr_map_", "pp")):
            carriers[k] = v
    for k in ("mux16", "mux64"):
        carriers[k] = defs[k]
    carriers["p1_active_carriers"] = p1["p1_active_carriers"]
    carriers["s1_patterns"] = p1_2d["s1_patterns"]
    carriers["s2_patterns"] = p1_2d["s2_patterns"]
    for k, v in addr.items():
        if k.startswith("bitperm"):
            carriers[k] = v
    for k, v in llr.items():
        if k.startswith(("tc_", "demux_")):
            carriers[k] = v
    np.savez_compressed(OUT / "etsi_carriers.npz", **carriers)
    print(f"wrote {OUT/'etsi_carriers.npz'}: {len(carriers)} tables")

    ldpc = extract_ldpc_tables()
    flat = {}
    for name, entry in ldpc.items():
        short = name.replace("DVB_T2_TABLE_", "")
        for f in ("M", "N", "K", "LINKS_MIN_CN", "LINKS_MAX_CN", "LINKS_TOTAL", "DEG_MAX"):
            flat[f"{short}__{f}"] = np.int64(entry[f])
        for f in ("DEG", "LEN", "POS"):
            flat[f"{short}__{f}"] = entry[f]
    np.savez_compressed(OUT / "etsi_ldpc.npz", **flat)
    print(f"wrote {OUT/'etsi_ldpc.npz'}: {len(ldpc)} code tables: {sorted(ldpc)}")


if __name__ == "__main__":
    sys.exit(main())
