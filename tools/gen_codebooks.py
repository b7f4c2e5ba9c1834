"""Generate the committed codeword tables (models/data/codebooks.npz).

Dev-time only (imports cv2). Two sources:

1. tag36h11 / tag36h10 / tag25h9 / tag16h5: real published AprilTag-3 tables,
   extracted from OpenCV aruco's rendered marker bitmaps (the physical ground
   truth — byte-packing of cv2's bytesList is rotation-ambiguous, the rendered
   bitmap is not).
2. The five flexible-layout families: deterministic lottery with the family's
   design Hamming distance (see families.py docstring for why the official
   tables are unavailable offline).

Provenance findings (verified in tests/test_codebooks.py): in AprilTag's
canonical orientation (cv2 bitmaps rotated 180 deg) all four published
tables are ordered subsequences of the arithmetic progression with stride
982451653 mod 2^nbits — the AprilTag generator's "lottery" candidate
sequence. Reproducing the five flexible tables bit-exactly would require
replaying the full published generation runs (candidate spaces 2^41..2^52,
originally cluster-scale compute) plus the generator's undocumented
complexity predicate; neither is feasible offline, hence the
self-consistent stand-ins + the `register_family` escape hatch for users
who vendor the published tables.

Run:  python tools/gen_codebooks.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from isaac_ros_apriltag_tpu.models import families as fam_mod

OUT = os.path.join(os.path.dirname(fam_mod.__file__), "data", "codebooks.npz")

CV2_DICTS = {
    "tag36h11": "DICT_APRILTAG_36h11",
    "tag36h10": "DICT_APRILTAG_36h10",
    "tag25h9": "DICT_APRILTAG_25h9",
    "tag16h5": "DICT_APRILTAG_16h5",
}

# ncodes to generate for families without public tables. Targets are capped
# both by count and by a candidate budget: at design distance h the random
# lottery's acceptance rate decays as e^(-4*A*p(h)) in the accepted count A,
# so dense families (41h12) plateau around ~1.5k codes in reasonable time.
GEN_NCODES = {
    "tagCircle21h7": 38,
    "tagCircle49h12": 2048,
    "tagCustom48h12": 2048,
    "tagStandard41h12": 1024,
    "tagStandard52h13": 2048,
}
CANDIDATE_BUDGET = 3_000_000  # per family


def extract_cv2_family(name: str) -> np.ndarray:
    import cv2

    d = cv2.aruco.getPredefinedDictionary(getattr(cv2.aruco, CV2_DICTS[name]))
    ms = d.markerSize
    n = np.array(d.bytesList).shape[0]
    codes = np.zeros(n, np.uint64)
    for i in range(n):
        img = cv2.aruco.generateImageMarker(d, i, ms + 2)  # 1 px per cell
        bits = (img[1:-1, 1:-1] > 128).astype(np.uint64).flatten()  # row-major
        c = np.uint64(0)
        for b in bits:
            c = (c << np.uint64(1)) | b
        codes[i] = c
    return codes


def bits_of(codes: np.ndarray, nbits: int) -> np.ndarray:
    """(N,) uint64 -> (N, nbits) uint8, bit 0 = MSB."""
    shifts = np.arange(nbits - 1, -1, -1, dtype=np.uint64)
    return ((codes[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)


def pack_bits(bits: np.ndarray) -> np.ndarray:
    nbits = bits.shape[-1]
    shifts = np.arange(nbits - 1, -1, -1, dtype=np.uint64)
    return (bits.astype(np.uint64) << shifts).sum(axis=-1, dtype=np.uint64)


def generate_family(name: str, target: int) -> np.ndarray:
    nbits, minh, _ = fam_mod.FAMILY_SPECS[name]
    tw, wb, rev, bx, by = fam_mod._layout(name)
    tmp = fam_mod.TagFamily(name=name, nbits=nbits, min_hamming=minh,
                            total_width=tw, width_at_border=wb,
                            reversed_border=rev, bit_x=bx, bit_y=by,
                            codes=np.zeros(0, np.uint64), exact=False)
    perms = tmp.rotation_perm  # (4, nbits)

    rng = np.random.default_rng(42)
    acc = np.zeros(4 * target, np.uint64)  # packed rotations of accepted codes
    nacc = 0
    out = []
    spent = 0
    BATCH = 4096
    while len(out) < target and spent < CANDIDATE_BUDGET:
        raw = rng.integers(0, 1 << 63, size=BATCH, dtype=np.uint64) \
            & np.uint64((1 << nbits) - 1)
        spent += BATCH
        cbits = bits_of(raw, nbits)                       # (B, nbits)
        crot_bits = cbits[:, perms]                       # (B, 4, nbits)
        crots = pack_bits(crot_bits)                      # (B, 4) packed
        # self-rotation distinctness
        dself = np.bitwise_count(crots[:, :1] ^ crots[:, 1:]).min(-1)
        ok = dself >= minh
        # distance to every accepted rotation (packed XOR + popcount)
        if nacc:
            d = np.bitwise_count(crots.reshape(-1, 1) ^ acc[None, :nacc])
            ok &= d.reshape(BATCH, 4, nacc).min(axis=(1, 2)) >= minh
        # greedy within the batch (candidates may conflict with each other)
        for i in np.nonzero(ok)[0]:
            rots = crots[i]
            if nacc:
                if np.bitwise_count(rots[:, None] ^ acc[None, :nacc]).min() < minh:
                    continue
            acc[nacc:nacc + 4] = rots
            nacc += 4
            out.append(raw[i])
            if len(out) >= target:
                break
    if len(out) < target:
        print(f"  [{name}] budget exhausted at {len(out)}/{target} codes")
    return np.array(out, np.uint64)


def main():
    tables = {}
    for name in CV2_DICTS:
        tables[name] = extract_cv2_family(name)
        print(f"{name}: {len(tables[name])} codes (cv2, exact); "
              f"id0 = {hex(int(tables[name][0]))}")
    for name, n in GEN_NCODES.items():
        tables[name] = generate_family(name, n)
        print(f"{name}: {len(tables[name])} codes (generated)")
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **tables)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
