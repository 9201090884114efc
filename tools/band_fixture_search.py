"""Search/verify hand-crafted LSH band-collision fixtures for
tests/test_kg_incremental_canon.py.

The incremental-canonicalization suite pins topology scenarios (bridge
X~B~Y, a 5-window band path with a disconnected tail, C0/CMIN influence
balls) onto concrete surface strings whose band collisions are
hash-derivation-specific. Whenever the MinHash lane spec changes (it
did in r5: one-md5-four-lanes replaced one-md5-per-lane and broke 6
fixtures), re-run this tool to find replacement strings instead of
hand-guessing.

The replica below is asserted lane-identical to the engine
(`check replica`) before any search runs: it mirrors
stages/canonicalize.py — normalize_surface (lower+trim for ASCII),
distinct char-3-gram shingles with conditional pad, lane i =
min over shingles of substring(md5(concat(i//4, '|', s)), 8*(i%4)+1, 8)
(minhash_cols / operators.dedup.minhash_sig_frame), band b key =
(b, m[2b], m[2b+1]) at k=8, bands=4, rows=2.

Usage:
  python tools/band_fixture_search.py replica   # Spark cross-check
  python tools/band_fixture_search.py verify    # current fixtures hold?
  python tools/band_fixture_search.py xby       # search a bridge triple
  python tools/band_fixture_search.py chain     # search the chain family
"""
from __future__ import annotations

import hashlib
import itertools
import random
import sys

K = 8
BANDS = 4


def norm(s: str) -> str:
    return s.strip().lower()


def shingle_set(n: str) -> set[str]:
    if len(n) < 3:
        n = n.ljust(3, "_")
    return {n[i : i + 3] for i in range(len(n) - 2)}


def lanes(s: str) -> list[str]:
    shs = shingle_set(norm(s))
    out = []
    for i in range(K):
        g, j = i // 4, i % 4
        out.append(
            min(
                hashlib.md5(f"{g}|{sh}".encode()).hexdigest()[8 * j : 8 * j + 8]
                for sh in shs
            )
        )
    return out


_cache: dict[str, frozenset] = {}


def bands_of(s: str) -> frozenset:
    if s not in _cache:
        m = lanes(s)
        _cache[s] = frozenset((b, m[2 * b], m[2 * b + 1]) for b in range(BANDS))
    return _cache[s]


def adj(a: str, b: str) -> bool:
    return bool(bands_of(a) & bands_of(b))


def isolated(s: str, others) -> bool:
    return all(not adj(s, o) for o in others)


# ── the isolation context every fixture must stay clear of ─────────────
FILLERS = [f"filler surface number {i:04d}" for i in range(60)]
OBJECTS = ["v1", "v2", "v3", "v4", "v9", "v10", "vz"] + [
    f"o{i}" for i in range(60)
] + [f"v{i}" for i in range(6)] + ["v90", "v91", "v92", "v93", "v94", "v95"]
FAM = "acme corporation limited shanghai branch"
FAM_MEMBERS = [FAM + str(i) for i in range(31)] + [FAM + "zz"]
ZEN_GROUP = [
    "zenith quantum holdings group",
    "zenith quantum holdings groupx",
    "aenith quantum holdings group",
]
FAR = "completely unrelated surface"


def check_replica() -> bool:
    """Assert the pure-Python lanes match the engine's minhash_sig_frame."""
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from docee_spark.operators.dedup import minhash_sig_frame
    from docee_spark.stages.canonicalize import normalize_surface, shingles

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    probes = [FAR, FAM + "3", "v9", "zz", ZEN_GROUP[0], "Mixed Case  Padded"]
    df = spark.createDataFrame([(t,) for t in probes], "surface string").withColumn(
        "norm", normalize_surface(F.col("surface"))
    )
    sig = minhash_sig_frame(
        df, ["surface", "norm"], shingles(F.col("norm")), K
    ).collect()
    ok = all(lanes(r["surface"]) == [r[f"m{i}"] for i in range(K)] for r in sig)
    spark.stop()
    print("replica lane-identical:", ok)
    return ok


def verify_current() -> bool:
    """Do the CURRENT test-file fixtures still satisfy their topology?"""
    import re

    src = open("tests/test_kg_incremental_canon.py", encoding="utf-8").read()

    def grab(name):
        return re.search(rf'^{name} = "([^"]+)"', src, re.M).group(1)

    X, B, Y = grab("X"), grab("B"), grab("Y")
    words = re.search(
        r"_CHAIN_WORDS = \(\s*((?:\"[^\"]*\"\s*)+)\)", src
    ).group(1)
    w = " ".join(p.strip('"') for p in words.split()).replace('"', "").split()
    c = [" ".join(w[2 * i : 2 * i + 6]) for i in range(6)]
    C0 = re.search(r'C0 = "([^"]+)"', src).group(1)
    CMIN = re.search(r'CMIN = "([^"]+)"', src).group(1)
    ctx = [FAR] + FILLERS + OBJECTS + FAM_MEMBERS + ZEN_GROUP
    checks = {
        "X~B": adj(X, B),
        "B~Y": adj(B, Y),
        "X!~Y": not adj(X, Y),
        "XBY isolated": all(isolated(s, ctx) for s in (X, B, Y)),
        "FAR isolated": isolated(FAR, FILLERS + OBJECTS + FAM_MEMBERS + ZEN_GROUP),
        "ZEN~ZEN2": adj(ZEN_GROUP[0], ZEN_GROUP[1]),
        "AEN~ZEN*": adj(ZEN_GROUP[2], ZEN_GROUP[0])
        or adj(ZEN_GROUP[2], ZEN_GROUP[1]),
        "FAM small sizes identical": all(
            bands_of(FAM + s) == bands_of(FAM + "0")
            for s in ["1", "2", "3", "4", "zz"]
        ),
        "chain path": all(adj(c[i], c[i + 1]) for i in range(4)),
        "c4!~c5": not adj(c[4], c[5]),
        "no skip adjacency": not any(
            adj(c[i], c[j])
            for i, j in itertools.combinations(range(6), 2)
            if j - i >= 2
        ),
        "C0~c0 only": adj(C0, c[0]) and isolated(C0, c[1:]),
        "CMIN~c0 only": adj(CMIN, c[0]) and isolated(CMIN, c[1:]),
        "c2 min of comp": min([c[0], c[1], c[2], c[3], c[4], C0]) == c[2],
        "c0<c1, c0<C0": c[0] < c[1] and c[0] < C0,
        "CMIN global min": CMIN < min([c[0], c[1], c[2], c[3], c[4], C0]),
        "chain isolated from objs": all(
            isolated(s, OBJECTS) for s in c + [C0, CMIN]
        ),
    }
    for k, v in checks.items():
        print(f"  {'ok ' if v else 'FAIL'} {k}")
    return all(checks.values())


def search_xby(seed: int = 0):
    pool = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu "
        "nu xi omicron pi rho sigma tau upsilon phi chi psi omega "
        "lambda vertex spiral corona nebula quasar photon proton neutron "
        "meson lepton hadron plasma vector tensor scalar matrix kernel"
    ).split()
    ctx = [FAR] + FILLERS + OBJECTS + FAM_MEMBERS + ZEN_GROUP
    rng = random.Random(seed)
    for trial in range(200000):
        w = rng.sample(pool, 9)
        X, B, Y = (
            " ".join(w[0:6]),
            " ".join(w[2:8]),
            " ".join(w[3:9]),
        )
        if not (adj(X, B) and adj(B, Y) and not adj(X, Y)):
            continue
        if not all(isolated(s, ctx) for s in (X, B, Y)):
            continue
        print(f"trial {trial}:\n  X = {X!r}\n  B = {B!r}\n  Y = {Y!r}")
        return X, B, Y
    print("no hit — widen the pool")
    return None


def search_chain(seed: int = 0):
    slot_alts = {
        0: ["amber", "almond", "aspen", "alder"],
        4: ["acorn", "acacia", "abies"],
        2: ["cedar", "cherry", "chestnut", "catalpa", "cypress"],
    }
    tailpool = (
        "dogwood fir ginkgo hazel ironwood juniper katsura larch maple "
        "nutmeg oak pecan quince rowan spruce tupelo walnut willow yew "
        "poplar sycamore magnolia hemlock hickory elm beech basswood "
        "buckeye hawthorn linden locust mulberry redwood sassafras teak"
    ).split()
    zpool = ["zulu", "zephyr", "zinnia", "zircon", "zebra", "zonal"]
    rng = random.Random(seed)
    for trial in range(500000):
        w = [None] * 16
        w[0] = rng.choice(slot_alts[0])
        w[2] = rng.choice(slot_alts[2])
        w[4] = rng.choice(slot_alts[4])
        ri = iter(rng.sample(tailpool, 13))
        for i in range(16):
            if w[i] is None:
                w[i] = next(ri)
        c = [" ".join(w[2 * i : 2 * i + 6]) for i in range(6)]
        if not all(adj(c[i], c[i + 1]) for i in range(4)):
            continue
        if adj(c[4], c[5]):
            continue
        if any(
            adj(c[i], c[j])
            for i, j in itertools.combinations(range(6), 2)
            if j - i >= 2
        ):
            continue
        for z in zpool:
            C0 = " ".join(w[0:3] + [z] + w[4:6])
            CMIN = "aa" + C0[2:]
            comp = [c[0], c[1], c[2], c[3], c[4], C0]
            if not (adj(C0, c[0]) and isolated(C0, c[1:])):
                continue
            if not (adj(CMIN, c[0]) and isolated(CMIN, c[1:])):
                continue
            if min(comp) != c[2] or not (c[0] < c[1] and c[0] < C0):
                continue
            if not CMIN < min(comp):
                continue
            if not all(isolated(s, OBJECTS) for s in c + [C0, CMIN]):
                continue
            print(f"trial {trial}:\n  words = {' '.join(w)}")
            for i, s in enumerate(c):
                print(f"  c{i} = {s!r}")
            print(f"  C0   = {C0!r}\n  CMIN = {CMIN!r}")
            return w, c, C0, CMIN
    print("no hit — widen the pools")
    return None


if __name__ == "__main__":
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    what = sys.argv[1] if len(sys.argv) > 1 else "verify"
    if what == "replica":
        sys.exit(0 if check_replica() else 1)
    elif what == "verify":
        sys.exit(0 if verify_current() else 1)
    elif what == "xby":
        search_xby()
    elif what == "chain":
        search_chain()
    else:
        print(__doc__)
