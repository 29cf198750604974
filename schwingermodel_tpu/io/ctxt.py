"""Byte-compatible gauge-configuration files (.ctxt).

Reproduces the reference's on-disk formats exactly so configurations are
interchangeable between the two codes:

  binary  (SaveConf / readBinary, src/gauge_conf.cpp:404-419 / :495-546):
      2*Nx*Nt packed 28-byte records `int32 x, int32 t, int32 mu,
      float64 re, float64 im`, ordered x-major, then t, then mu.
  text    (read_conf, src/gauge_conf.cpp:453-492; produced by the
      readBinConf.cpp converter): whitespace-separated `x t mu re im` lines.
  name    (src/hmc.cpp:202-206 + format() at include/variables.h:197-203):
      2D_U1_Ns{Nx}_Nt{Nt}_b{beta:.4f minus dot}_m{m0:.4f minus dot}_{i}.ctxt

Encoding/decoding runs through the native C++ codec
(schwingermodel_tpu/native/ctxt_codec.cpp) when the shared library is
available, with a vectorized NumPy fallback producing identical bytes.
Links are always written as float64 complex regardless of compute dtype,
like the reference.
"""

from __future__ import annotations

import os

import numpy as np

from schwingermodel_tpu.native import load_codec

# 28-byte packed record (x-major, t, mu order on disk)
RECORD_DTYPE = np.dtype(
    [("x", "<i4"), ("t", "<i4"), ("mu", "<i4"), ("re", "<f8"), ("im", "<f8")]
)
assert RECORD_DTYPE.itemsize == 28


def _fmt(v: float) -> str:
    """Reference format(): fixed 4 decimals, decimal dot removed
    (include/variables.h:197-203)."""
    s = f"{v:.4f}"
    return s.replace(".", "", 1)


def conf_filename(Nx: int, Nt: int, beta: float, m0: float, index: int) -> str:
    """Measurement-configuration filename (src/hmc.cpp:202-206)."""
    return f"2D_U1_Ns{Nx}_Nt{Nt}_b{_fmt(beta)}_m{_fmt(m0)}_{index}.ctxt"


def ill_conf_filename(Nx: int, Nt: int, beta: float, m0: float, index: int) -> str:
    """Non-converged-CG dump filename (src/hmc.cpp:50-55)."""
    return f"2D_U1_Ns{Nx}_Nt{Nt}_b{_fmt(beta)}_m{_fmt(m0)}_illConf{index}.ctxt"


def links_from_theta(theta) -> np.ndarray:
    """complex128 links U = exp(i theta), [2, Nx, Nt] (host-side, f64)."""
    th = np.asarray(theta, dtype=np.float64)
    return np.cos(th) + 1j * np.sin(th)


def theta_from_links(U) -> np.ndarray:
    """Angles from complex links (principal branch).

    For configurations produced by this framework the links are exactly
    unit-modulus; for reference-produced files they are unit-modulus up to
    f64 rounding, and taking the angle projects back onto U(1) exactly.
    """
    return np.angle(np.asarray(U, dtype=np.complex128)).astype(np.float64)


def _interleaved(U: np.ndarray) -> np.ndarray:
    """[2,Nx,Nt] complex128 -> C-contiguous interleaved re/im doubles."""
    U = np.ascontiguousarray(U, dtype=np.complex128)
    return U.view(np.float64)  # [..., 2*Nt] interleaved; contiguous layout


def _records_from_links(U: np.ndarray) -> np.ndarray:
    _, Nx, Nt = U.shape
    rec = np.empty(Nx * Nt * 2, dtype=RECORD_DTYPE)
    # disk order: x-major, then t, then mu -> transpose to [x, t, mu]
    Uxt = np.transpose(U, (1, 2, 0)).reshape(-1)
    grid_x, grid_t, grid_mu = np.meshgrid(
        np.arange(Nx, dtype=np.int32),
        np.arange(Nt, dtype=np.int32),
        np.arange(2, dtype=np.int32),
        indexing="ij",
    )
    rec["x"] = grid_x.reshape(-1)
    rec["t"] = grid_t.reshape(-1)
    rec["mu"] = grid_mu.reshape(-1)
    rec["re"] = Uxt.real
    rec["im"] = Uxt.imag
    return rec


def _links_from_records(rec: np.ndarray, Nx: int, Nt: int) -> np.ndarray:
    if rec.size != Nx * Nt * 2:
        raise ValueError(
            f"expected {Nx * Nt * 2} records for {Nx}x{Nt}, got {rec.size}"
        )
    if (
        rec["x"].min() < 0 or rec["x"].max() >= Nx
        or rec["t"].min() < 0 or rec["t"].max() >= Nt
        or rec["mu"].min() < 0 or rec["mu"].max() > 1
    ):
        raise ValueError("corrupt .ctxt: site indices out of range")
    U = np.empty((2, Nx, Nt), dtype=np.complex128)
    U[rec["mu"], rec["x"], rec["t"]] = rec["re"] + 1j * rec["im"]
    return U


def write_conf(path: str, U, *, binary: bool = True) -> None:
    """Write links U [2, Nx, Nt] (complex, any float dtype) to a .ctxt file."""
    U = np.ascontiguousarray(np.asarray(U), dtype=np.complex128)
    _, Nx, Nt = U.shape
    lib = load_codec()
    if lib is not None:
        import ctypes

        buf = _interleaved(U)
        fn = lib.ctxt_write_binary if binary else lib.ctxt_write_text
        rc = fn(
            path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            Nx, Nt,
        )
        if rc != 0:
            raise OSError(f"native ctxt write failed ({rc}): {path}")
        return
    # NumPy fallback: identical bytes
    rec = _records_from_links(U)
    if binary:
        rec.tofile(path)
    else:
        with open(path, "w") as f:
            for r in rec:
                f.write(f"{r['x']} {r['t']} {r['mu']} {r['re']:.17g} {r['im']:.17g}\n")


def read_conf(path: str, Nx: int, Nt: int, *, binary: bool | None = None) -> np.ndarray:
    """Read a .ctxt file -> complex128 links [2, Nx, Nt].

    binary=None sniffs the format (the reference keeps two separate readers,
    gauge_conf.cpp:453 and :495, and makes the user pick)."""
    if binary is None:
        with open(path, "rb") as f:
            head = f.read(64)
        try:
            head.decode("ascii")
            binary = False
        except UnicodeDecodeError:
            binary = True
    lib = load_codec()
    if lib is not None:
        import ctypes

        buf = np.empty((2, Nx, Nt, 2), dtype=np.float64)
        fn = lib.ctxt_read_binary if binary else lib.ctxt_read_text
        rc = fn(
            path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            Nx, Nt,
        )
        if rc == -1:
            raise FileNotFoundError(path)
        if rc != 0:
            raise ValueError(f"corrupt or wrong-shape .ctxt ({rc}): {path}")
        return (buf[..., 0] + 1j * buf[..., 1]).astype(np.complex128)
    if binary:
        rec = np.fromfile(path, dtype=RECORD_DTYPE)
    else:
        flat = np.loadtxt(path, dtype=np.float64).reshape(-1, 5)
        rec = np.empty(len(flat), dtype=RECORD_DTYPE)
        rec["x"], rec["t"], rec["mu"] = (
            flat[:, 0].astype(np.int32),
            flat[:, 1].astype(np.int32),
            flat[:, 2].astype(np.int32),
        )
        rec["re"], rec["im"] = flat[:, 3], flat[:, 4]
    return _links_from_records(rec, Nx, Nt)


def convert_binary_to_text(src: str, dst: str, Nx: int, Nt: int) -> None:
    """Standalone converter (reference readBinConf.cpp / readBin.sh)."""
    U = read_conf(src, Nx, Nt, binary=True)
    write_conf(dst, U, binary=False)


def sniff_lattice_shape(path: str) -> tuple[int, int]:
    """Infer (Nx, Nt) from a binary .ctxt file's own index records."""
    rec = np.fromfile(path, dtype=RECORD_DTYPE)
    if rec.size == 0 or os.path.getsize(path) % RECORD_DTYPE.itemsize:
        raise ValueError(f"not a binary .ctxt file: {path}")
    return int(rec["x"].max()) + 1, int(rec["t"].max()) + 1
