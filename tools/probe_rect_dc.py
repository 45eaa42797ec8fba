"""DC sweep: distinguish dav1d's dconly path (eob=1) from the general
path (eob>1) on 32x16, and fit each chain."""
import sys

import numpy as np

sys.path.insert(0, ".")

from probe_rect_inverse import TH, TW, dav1d_residual


def main():
    print("=== eob=1 (dconly path): level at (0,0) ===")
    for v in range(1, 13):
        lv = np.zeros((TH, TW), np.int64)
        lv[0, 0] = v
        resid, dq = dav1d_residual(lv)
        u = np.unique(resid)
        print(f"v={v:2d} dq={dq[0,0]:4d} resid uniq={u}")

    print("\n=== eob=2 (general path): DC=v plus tiny AC at (0,1) ===")
    for v in range(1, 13):
        lv = np.zeros((TH, TW), np.int64)
        lv[0, 0] = v
        lv[0, 1] = 1
        resid, dq = dav1d_residual(lv)
        # corner value is dominated by DC; print a few positions
        print(f"v={v:2d} dq={dq[0,0]:4d} ac={dq[0,1]:4d} "
              f"[0,0]={resid[0,0]} [0,31]={resid[0,31]} "
              f"[15,0]={resid[15,0]} [8,16]={resid[8,16]}")


if __name__ == "__main__":
    main()
