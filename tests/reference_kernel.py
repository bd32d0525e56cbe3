"""Pure-Python oracle: a faithful, loop-style reimplementation of the
reference kernel's math (flow.py:129-203, 254-398) over lists of dicts.

Deliberately written like the reference (plain loops, Python round) and
independently of flow_feature_spark.kernel's NumPy code, so agreement between
the two is a real cross-check (SURVEY.md §5.2).
"""

from __future__ import annotations

import math

EPS = 0.0001


def ref_calculation(vals):
    if not vals:
        return [0.0, 0.0, 0.0, 0.0]
    mean = sum(vals) / len(vals)
    std = math.sqrt(sum((x - mean) ** 2 for x in vals) / len(vals))
    return [round(mean, 6), round(min(vals), 6), round(max(vals), 6), round(std, 6)]


def ref_iat(ts_us_list):
    if len(ts_us_list) == 0:
        return [0.0, 0.0, 0.0, 0.0]
    gaps = []
    prev = ts_us_list[0]
    for t in ts_us_list[1:]:
        gaps.append((t - prev) / 1e6)  # exact integer-µs diff, like EDecimal
        prev = t
    return ref_calculation(gaps)


def ref_sum_stats(vals):
    if len(vals) == 0:
        return [0.0, 0.0, 0.0, 0.0, 0.0]
    return [round(sum(vals), 6)] + ref_calculation(vals)


def ref_flags(flag_ints, key):
    cnt = [0] * 8
    if len(flag_ints) == 0:
        return (-1, -1) if key == 1 else [-1] * 8
    for v in flag_ints:
        v = int(v)
        for i in range(8):
            cnt[i] += v % 2
            v //= 2
    return (cnt[3], cnt[5]) if key == 1 else cnt


def ref_hdr_len(ihls):
    return sum(14 + 4 * int(i) + 20 for i in ihls)


def ref_feature_vector(turns):
    """turns: list of dicts (ts_us, turn_idx, is_fwd, plen, win, flags, ihl),
    any order. Returns 72 floats or None if <2 turns."""
    if len(turns) <= 1:
        return None
    turns = sorted(turns, key=lambda t: (t["ts_us"], t["turn_idx"]))
    fwd = [t for t in turns if t["is_fwd"]]
    bwd = [t for t in turns if not t["is_fwd"]]

    out = []
    out += ref_iat([t["ts_us"] for t in fwd])
    out += ref_iat([t["ts_us"] for t in bwd])
    out += ref_iat([t["ts_us"] for t in turns])
    duration = round((turns[-1]["ts_us"] - turns[0]["ts_us"]) / 1e6 + EPS, 6)
    out.append(duration)
    fwin = ref_sum_stats([t["win"] for t in fwd])
    bwin = ref_sum_stats([t["win"] for t in bwd])
    out += fwin + bwin + ref_sum_stats([t["win"] for t in turns])
    fpnum, bpnum = len(fwd), len(bwd)
    fpnum_s = round(fpnum / duration, 6)
    bpnum_s = round(bpnum / duration, 6)
    out += [
        float(fpnum), float(bpnum), float(fpnum + bpnum),
        round(bpnum / max(fpnum, 1), 6), fpnum_s, bpnum_s, fpnum_s + bpnum_s,
    ]
    fpl = ref_sum_stats([t["plen"] for t in fwd])
    bpl = ref_sum_stats([t["plen"] for t in bwd])
    dpl = ref_sum_stats([t["plen"] for t in turns])
    fpl_s = round(fpl[0] / duration, 6)
    bpl_s = round(bpl[0] / duration, 6)
    out += fpl + bpl + dpl
    out += [round(bpl[0] / max(fpl[0], 1), 6), fpl_s, bpl_s, fpl_s + bpl_s]
    out += [float(x) for x in ref_flags([t["flags"] for t in turns], 0)]
    fp = ref_flags([t["flags"] for t in fwd], 1)
    bp = ref_flags([t["flags"] for t in bwd], 1)
    out += [float(fp[0]), float(fp[1]), float(bp[0]), float(bp[1])]
    fh = float(ref_hdr_len([t["ihl"] for t in fwd]))
    bh = float(ref_hdr_len([t["ihl"] for t in bwd]))
    out += [
        fh, bh, fh + bh,
        round(fh / max(fpl[0], 1), 6),
        round(bh / max(bpl[0], 1), 6),
        round((fh + bh) / max(dpl[0], 1), 6),
    ]
    assert len(out) == 72
    return out


def ref_sessionize(turns, gap_s):
    """Sorted-by-(ts,turn_idx) turns of ONE conv -> list of sessions (lists)."""
    turns = sorted(turns, key=lambda t: (t["ts_us"], t["turn_idx"]))
    gap_us = int(round(gap_s * 1_000_000))
    sessions, cur, prev = [], [], None
    for t in turns:
        if prev is not None and (t["ts_us"] - prev) > gap_us:
            sessions.append(cur)
            cur = []
        cur.append(t)
        prev = t["ts_us"]
    if cur:
        sessions.append(cur)
    return sessions
