"""Matrix acquisition: SuiteSparse download + synthetic test suites.

Reference equivalents: src/scripts/get_matrices.py (ssgetpy download of
SuiteSparse matrices with 2e4 <= N <= 1e5 and 1e-4 <= density <= 0.1),
get_matrices.sh (ssget), and the synthetic RMAT/uniform sets referenced in
its result CSVs.  Network access is optional: the synthetic suite generates
a comparable testbed locally.
"""
from __future__ import annotations

import io
import tarfile
import urllib.request
from pathlib import Path

import numpy as np

from .formats.csr import CSR, random_block_csr, random_uniform_csr, read_mtx, rmat_csr

SUITESPARSE_URL = "https://suitesparse-collection-website.herokuapp.com/MM/{group}/{name}.tar.gz"


def download_suitesparse(group: str, name: str, dest_dir: str | Path) -> Path:
    """Fetch one SuiteSparse matrix (MatrixMarket tarball).  Requires
    network access; raises URLError otherwise."""
    dest_dir = Path(dest_dir)
    dest_dir.mkdir(parents=True, exist_ok=True)
    out = dest_dir / f"{name}.mtx"
    if out.exists():
        return out
    url = SUITESPARSE_URL.format(group=group, name=name)
    data = urllib.request.urlopen(url, timeout=120).read()
    with tarfile.open(fileobj=io.BytesIO(data), mode="r:gz") as tf:
        for member in tf.getmembers():
            if member.name.endswith(f"{name}.mtx"):
                out.write_bytes(tf.extractfile(member).read())
                return out
    raise FileNotFoundError(f"{name}.mtx not in tarball")


def load_suitesparse(group: str, name: str, dest_dir: str | Path) -> CSR:
    return read_mtx(download_suitesparse(group, name, dest_dir))


# matrices used by the reference experiments (small, CPU-feasible examples)
REFERENCE_SET = [
    ("HB", "bcsstk18"),
    ("SNAP", "wiki-Vote"),
    ("SNAP", "ca-HepPh"),
    ("Botonakis", "FEM_3D_thermal1"),
]

# the reference ships seven real-world graphs as test DATA
# (reference data/real_world/: wiki-Vote, ca-HepPh, bcsstk18, ...); they are
# read in place at bench/test time, never copied into this repo
REFERENCE_GRAPH_DIR = Path("/root/reference/data/real_world")


def reference_graphs(data_dir: str | Path | None = None) -> dict[str, Path]:
    """Discover the reference's shipped real-world graphs (name -> path).
    Empty dict when the reference tree is not available."""
    d = Path(data_dir or REFERENCE_GRAPH_DIR)
    if not d.is_dir():
        return {}
    return {p.stem: p for p in sorted(d.glob("*.el"))}


def load_reference_graph(
    name: str,
    data_dir: str | Path | None = None,
    pattern_only: bool = True,
) -> CSR:
    """Load one shipped real-world graph.

    Formats in the set vary (0- or 1-based indices, '%' comment banners,
    optional float weights); ``read_edgelist`` handles all of them.
    1-based files simply carry an empty row/column 0 — the same shape the
    reference's max-index rule produces after its header-line skip
    (csr.cpp:183-311)."""
    graphs = reference_graphs(data_dir)
    if name not in graphs:
        raise FileNotFoundError(
            f"graph {name!r} not in {sorted(graphs)} "
            f"(reference data dir missing?)"
        )
    from .formats.csr import read_edgelist

    return read_edgelist(graphs[name], pattern_only=pattern_only)


def banded_csr(n: int, bandwidth: int, seed: int = 0, density: float = 0.5) -> CSR:
    """Banded matrix with random fill inside the band."""
    rng = np.random.default_rng(seed)
    rows, cols = [], []
    for off in range(-bandwidth, bandwidth + 1):
        d = np.arange(max(0, -off), min(n, n - off))
        keep = rng.random(d.size) < density
        rows.append(d[keep])
        cols.append((d + off)[keep])
    r = np.concatenate(rows)
    c = np.concatenate(cols)
    v = rng.standard_normal(r.size).astype(np.float32)
    return CSR.from_coo(r, c, v, (n, n))


def synthetic_suite(scale: str = "small", seed: int = 0) -> dict[str, CSR]:
    """A battery mirroring the reference's SuiteSparse box (varied density,
    structure, and reorderability).  scale: small (tests) | medium (bench)."""
    n = {"small": 512, "medium": 8192, "large": 32768}[scale]
    return {
        "uniform_sparse": random_uniform_csr(n, n, 1e-3, seed=seed),
        "uniform_denser": random_uniform_csr(n, n, 1e-2, seed=seed + 1),
        "blocked_shuffled": random_block_csr(
            n, n, block=max(n // 80, 8), block_density=0.08,
            intra_density=0.3, seed=seed + 2
        ),
        "banded": banded_csr(n, bandwidth=max(n // 64, 4), seed=seed + 3),
        "rmat": rmat_csr(int(np.log2(n)), edge_factor=8, seed=seed + 4),
        "fem_2d": stencil_csr(
            (int(np.sqrt(n)),) * 2, pattern="box", seed=seed + 5),
        "fem_3d": stencil_csr(
            (max(int(round(n ** (1 / 3))), 2),) * 3, pattern="star",
            seed=seed + 6),
    }


def stencil_csr(grid: tuple[int, ...], pattern: str = "star", seed: int = 0,
                weighted: bool = True) -> CSR:
    """FEM/finite-difference stencil matrix on a regular grid — the
    SuiteSparse-FEM-like structure (bcsstk18 / FEM_3D_thermal1 class) that
    blocks well under similarity reordering.

    grid: (nx, ny) or (nx, ny, nz); pattern: "star" (5/7-point) or "box"
    (9/27-point).
    """
    import itertools

    import scipy.sparse as sp

    dims = len(grid)
    if pattern == "star":
        offsets = [tuple(0 if j != i else d for j in range(dims))
                   for i in range(dims) for d in (-1, 1)]
    else:  # box
        offsets = [o for o in itertools.product((-1, 0, 1), repeat=dims)
                   if any(o)]
    n = int(np.prod(grid))
    idx = np.arange(n).reshape(grid)
    rows, cols = [idx.ravel()], [idx.ravel()]  # diagonal
    for off in offsets:
        src = tuple(slice(max(0, -o), (None if o <= 0 else -o)) for o in off)
        dst = tuple(slice(max(0, o), (None if o >= 0 else o)) for o in off)
        rows.append(idx[src].ravel())
        cols.append(idx[dst].ravel())
    r = np.concatenate(rows)
    c = np.concatenate(cols)
    if weighted:
        rng = np.random.default_rng(seed)
        v = rng.standard_normal(r.size).astype(np.float32)
    else:
        v = np.ones(r.size, dtype=np.float32)
    S = sp.coo_matrix((v, (r, c)), shape=(n, n)).tocsr()
    return CSR.from_scipy(S)
