"""Detail dump for single-coefficient rect probes."""
import sys

import numpy as np

sys.path.insert(0, ".")

from probe_rect_inverse import (CANDIDATES, TH, TW, dav1d_residual)


def main():
    for (r, c, v) in [(0, 0, 1), (0, 0, 2), (0, 0, 5), (1, 1, 3),
                      (0, 1, 3), (2, 3, 4)]:
        lv = np.zeros((TH, TW), np.int64)
        lv[r, c] = v
        resid, dq = dav1d_residual(lv)
        print(f"\n--- level[{r},{c}]={v}  dq={dq[r, c]} ---")
        print(f"dav1d resid[0,0]={resid[0, 0]} [0,1]={resid[0, 1]} "
          f"[1,0]={resid[1, 0]} [3,5]={resid[3, 5]} "
          f"uniq={np.unique(resid)[:6]}")
        for k, fn in CANDIDATES.items():
            ours = fn(dq)
            d = int(np.abs(ours - resid).max())
            print(f"  {k:34s} [0,0]={ours[0, 0]} maxdiff={d}")


if __name__ == "__main__":
    main()
