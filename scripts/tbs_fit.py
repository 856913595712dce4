"""Experiment: can 36.213 Table 7.1.7.2.1-1 be reproduced from its
documented construction (R1-081638-style)?

Hypothesis: for n_prb >= 2, TBS(i, n) = quantize(SE_i * 120 * n) onto the
set of "uniformly segmenting" transport block sizes (C equal turbo code
blocks, zero filler), where SE_i is a per-row spectral-efficiency target.

Method: treat SE_i as unknown; each known entry T at column n constrains
SE_i to an interval (depending on the quantization rule).  If the
intersection over all known columns is non-empty for every row AND a rule
is found, the construction is validated against 270 known entries and can
generate the other 99 columns.  If any intersection is empty, the
hypothesis fails and we must NOT generate the table this way.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from lteax.phy.tables.turbo_qpp import VALID_K
from lteax.phy.tables.tbs import TBS_COLUMNS
from lteax.phy.fec.segmentation import segment_info


def allowed_tbs(max_tbs=400000):
    """All TBS with uniform segmentation (single K, zero filler)."""
    out = set()
    ks = sorted(VALID_K)
    for k in ks:
        if k - 24 > 0:
            out.add(k - 24)          # C == 1 (needs TBS+24 <= 6144)
    c = 2
    while True:
        added = False
        for k in ks:
            t = c * (k - 24) - 24
            if t > max_tbs:
                continue
            added = True
            out.add(t)
        if c * (min(ks) - 24) - 24 > max_tbs:
            break
        c += 1
        if c > 300:
            break
    # verify against the real segmentation routine
    good = []
    for t in sorted(out):
        if t <= 0:
            continue
        info = segment_info(t + 24)
        if info.c_minus == 0 and info.f == 0:
            good.append(t)
    return np.asarray(good, dtype=np.int64)


def main():
    allowed = allowed_tbs()
    print(f"{len(allowed)} allowed uniform TBS values "
          f"(min {allowed[0]}, max {allowed[-1]})")
    cols = {n: v for n, v in TBS_COLUMNS.items() if n >= 2}
    ns = sorted(cols)
    n_rows = 27

    def idx_of(t):
        i = np.searchsorted(allowed, t)
        assert allowed[i] == t, f"known TBS {t} is not uniform-segmenting!"
        return i

    for rule in ("floor", "nearest", "ceil"):
        ok_rows = 0
        fails = []
        se_rows = []
        for i in range(n_rows):
            lo, hi = 0.0, 1e9
            for n in ns:
                t = cols[n][i]
                j = idx_of(t)
                prev_t = allowed[j - 1] if j > 0 else 0
                next_t = allowed[j + 1] if j + 1 < len(allowed) else t * 2
                x = 120.0 * n
                crc = 24.0
                if rule == "floor":       # largest allowed: t+24 <= target
                    a, b = (t + crc) / x, (next_t + crc) / x
                elif rule == "ceil":      # smallest allowed >= target
                    a, b = (prev_t + crc) / x, (t + crc) / x
                else:                     # nearest allowed (on t+24)
                    a, b = ((t + prev_t) / 2.0 + crc) / x, ((t + next_t) / 2.0 + crc) / x
                lo, hi = max(lo, a), min(hi, b)
            if lo < hi:
                ok_rows += 1
                se_rows.append((lo, hi))
            else:
                fails.append(i)
                se_rows.append(None)
        print(f"rule={rule}: {ok_rows}/27 rows consistent"
              + (f", fails at i_tbs={fails}" if fails else ""))
        if ok_rows == n_rows:
            print("  per-row SE windows:")
            for i, (lo, hi) in enumerate(se_rows):
                print(f"    i_tbs {i:2d}: SE in [{lo:.6f}, {hi:.6f})"
                      f" width {hi-lo:.2e}")


if __name__ == "__main__":
    main()
