"""I/O tests: byte-for-byte compatibility with the C++ reference formats.

Golden files under tests/golden/ were produced by the actual reference
binary compiled from /root/reference (8x8 run, beta=2, m0=0.1, save=1):
  - 2D_U1_Ns8_Nt8_b20000_m01000_{0,1,2}.ctxt : binary SaveConf output
  - golden_text_0.txt : readBinConf.cpp text conversion of conf 0
  - 2D_U1_8x8_m00.10000000000000001_SimData.txt : the run's SimData file
"""

import os

import numpy as np
import pytest

from schwingermodel_tpu.config import CGParams, HMCParams, LatticeParams, RunParams
from schwingermodel_tpu.io import ctxt
from schwingermodel_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from schwingermodel_tpu.io.simdata import SimData, simdata_filename
from schwingermodel_tpu.native import load_codec

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
G0 = os.path.join(GOLDEN, "2D_U1_Ns8_Nt8_b20000_m01000_0.ctxt")


def test_filename_conventions():
    assert ctxt.conf_filename(8, 8, 2.0, 0.1, 0) == "2D_U1_Ns8_Nt8_b20000_m01000_0.ctxt"
    assert ctxt.conf_filename(64, 64, 4.0, 0.2, 7) == "2D_U1_Ns64_Nt64_b40000_m02000_7.ctxt"
    assert ctxt.conf_filename(8, 8, 2.0, -0.1, 0) == "2D_U1_Ns8_Nt8_b20000_m-01000_0.ctxt"
    assert simdata_filename(8, 8, 0.1) == "2D_U1_8x8_m00.10000000000000001_SimData.txt"


def test_read_golden_binary_is_unitary():
    U = ctxt.read_conf(G0, 8, 8, binary=True)
    assert U.shape == (2, 8, 8)
    np.testing.assert_allclose(np.abs(U), 1.0, atol=1e-12)


def test_binary_roundtrip_bytes_identical(tmp_path):
    """Read a reference-produced file and re-write it: identical bytes."""
    U = ctxt.read_conf(G0, 8, 8, binary=True)
    out = str(tmp_path / "rewrite.ctxt")
    ctxt.write_conf(out, U, binary=True)
    with open(G0, "rb") as a, open(out, "rb") as b:
        assert a.read() == b.read()


def test_native_and_numpy_paths_identical(tmp_path, monkeypatch):
    U = ctxt.read_conf(G0, 8, 8, binary=True)
    p_native = str(tmp_path / "native.ctxt")
    p_numpy = str(tmp_path / "numpy.ctxt")
    if load_codec() is None:
        pytest.skip("native codec unavailable (no compiler)")
    ctxt.write_conf(p_native, U, binary=True)
    monkeypatch.setattr("schwingermodel_tpu.io.ctxt.load_codec", lambda: None)
    ctxt.write_conf(p_numpy, U, binary=True)
    with open(p_native, "rb") as a, open(p_numpy, "rb") as b:
        assert a.read() == b.read()
    # and both readers parse identically
    U_native = ctxt.read_conf(p_native, 8, 8, binary=True)
    monkeypatch.undo()
    U2 = ctxt.read_conf(p_native, 8, 8, binary=True)
    np.testing.assert_array_equal(U_native, U2)


def test_reference_text_form_parses_like_binary():
    """The readBinConf.cpp text conversion must parse to the same links."""
    U_bin = ctxt.read_conf(G0, 8, 8, binary=True)
    U_txt = ctxt.read_conf(os.path.join(GOLDEN, "golden_text_0.txt"), 8, 8,
                           binary=False)
    np.testing.assert_array_equal(U_bin, U_txt)


def test_format_sniffing():
    U_bin = ctxt.read_conf(G0, 8, 8)          # sniffed binary
    U_txt = ctxt.read_conf(os.path.join(GOLDEN, "golden_text_0.txt"), 8, 8)
    np.testing.assert_array_equal(U_bin, U_txt)


def test_text_roundtrip_through_our_writer(tmp_path):
    U = ctxt.read_conf(G0, 8, 8)
    p = str(tmp_path / "ours.txt")
    ctxt.write_conf(p, U, binary=False)
    np.testing.assert_array_equal(ctxt.read_conf(p, 8, 8, binary=False), U)


def test_theta_links_roundtrip(rng):
    theta = rng.uniform(-np.pi, np.pi, (2, 8, 8))
    U = ctxt.links_from_theta(theta)
    np.testing.assert_allclose(ctxt.theta_from_links(U), theta, atol=1e-15)


def test_sniff_lattice_shape():
    assert ctxt.sniff_lattice_shape(G0) == (8, 8)


def test_corrupt_file_rejected(tmp_path):
    p = str(tmp_path / "bad.ctxt")
    rec = np.zeros(128, dtype=ctxt.RECORD_DTYPE)
    rec["x"] = 99  # out of range for 8x8
    rec.tofile(p)
    with pytest.raises((ValueError, OSError)):
        ctxt.read_conf(p, 8, 8, binary=True)


def test_wrong_shape_rejected(tmp_path):
    U = ctxt.read_conf(G0, 8, 8)
    with pytest.raises((ValueError, OSError)):
        ctxt.read_conf(G0, 16, 16, binary=True)


def test_simdata_matches_reference_layout(tmp_path):
    """Byte-identical to the golden SimData for the same inputs."""
    golden_path = os.path.join(GOLDEN, "2D_U1_8x8_m00.10000000000000001_SimData.txt")
    with open(golden_path) as f:
        golden = f.read()
    p = str(tmp_path / "sim.txt")
    sd = SimData(p)
    sd.write_header(
        Nx=8, Nt=8, ranks_x=1, ranks_t=1, beta=2.0, n_therm=20, n_meas=3,
        n_steps=0, trajectory_length=1.0, md_steps=10, cg_max_iter=10000,
        cg_tol=1e-10, m0=0.1,
        start_time="2026-08-17 07:45:59", host="unknown",
    )
    sd.append_results(
        Ep=0.70456244038167803, dEp=3.0711164770381352,
        gS=0.5908751192366436, dgS=2.5755649330050749,
        acceptance_rate=1.0, elapsed_seconds=0.3895916319997923,
    )
    with open(p) as f:
        ours = f.read()
    assert ours == golden


def test_checkpoint_roundtrip(tmp_path, rng):
    theta = rng.uniform(-np.pi, np.pi, (2, 8, 8))
    key = np.array([1234, 5678], dtype=np.uint32)
    lat = LatticeParams(Nx=8, Nt=8, real_dtype="float64")
    hmc = HMCParams(beta=2.0, m0=0.1, cg=CGParams(tol=1e-9, max_iter=500))
    run = RunParams(n_therm=10, n_meas=20, seed=3, mesh_shape=(2, 4))
    p = str(tmp_path / "ckpt.npz")
    save_checkpoint(
        p, theta=theta, key=key, traj_index=42, lattice=lat, hmc=hmc, run=run,
        chains={"plaquette": [0.1, 0.2, 0.3]},
    )
    ck = load_checkpoint(p)
    np.testing.assert_array_equal(ck["theta"], theta)
    np.testing.assert_array_equal(ck["key"], key)
    assert ck["traj_index"] == 42
    assert ck["lattice"] == lat
    assert ck["hmc"] == hmc
    assert ck["run"] == run
    np.testing.assert_array_equal(ck["chains"]["plaquette"], [0.1, 0.2, 0.3])


def test_readbinconf_tool_matches_reference_converter_bytes(tmp_path):
    """Our standalone converter reproduces readBinConf.cpp's text output
    byte-for-byte (golden_text_0.txt was written by the compiled reference
    converter from the golden binary)."""
    from schwingermodel_tpu.tools import readbinconf

    out = str(tmp_path / "conv.txt")
    assert readbinconf.convert(G0, out) == (8, 8)
    with open(os.path.join(GOLDEN, "golden_text_0.txt")) as a, open(out) as b:
        assert a.read() == b.read()


def test_readbinconf_tool_stdin_pipe(tmp_path, monkeypatch, capsys):
    """Pipe-compatible with the reference workflow: filenames on stdin
    (readBin.sh:13-14 `./readBinConf < filenames`)."""
    import io as _io

    from schwingermodel_tpu.tools import readbinconf

    out = str(tmp_path / "conv.txt")
    monkeypatch.setattr("sys.stdin", _io.StringIO(f"{G0}\n{out}"))
    assert readbinconf.main([]) == 0
    assert "Nx 8  Nt 8" in capsys.readouterr().out
    np.testing.assert_array_equal(
        ctxt.read_conf(out, 8, 8, binary=False), ctxt.read_conf(G0, 8, 8))


def test_readbinconf_tool_missing_file(capsys):
    from schwingermodel_tpu.tools import readbinconf

    assert readbinconf.main(["/nonexistent.ctxt", "/tmp/x.txt"]) == 1
