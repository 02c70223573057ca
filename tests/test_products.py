"""CSV product format parity (effex.py:667-696) and the writer thread."""

import threading
import time
from queue import Queue

import numpy as np
import pytest

from fxtpu.config import CorrelatorConfig
from fxtpu import products


def test_spectrum_header_and_rows(tmp_csv):
    cfg = CorrelatorConfig(mode="SPECTRUM", num_samp=2**14, nbins=2**10,
                           clamp_num_samp=False)
    products.write_metadata(tmp_csv, cfg)
    with open(tmp_csv) as fh:
        header = fh.readline().strip()
        freq_row = fh.readline().strip()
    # reference header fields in order (effex.py:671-678)
    assert header.startswith("run_time:1.0,bandwidth:2400000.0,"
                             "frequency:1420400000.0,num_samp:16384,"
                             "resolution:1024,gain:49.6,mode:SPECTRUM")
    expected = np.fft.fftshift(np.fft.fftfreq(2**10, d=1 / 2.4e6)) + 1.4204e9
    got = np.array([float(v) for v in freq_row.split(",")])
    np.testing.assert_allclose(got, expected, rtol=1e-10)

    # complex rows load back with the reference's exact recipe
    # (effex.py:798: np.loadtxt(dtype=complex128, skiprows=2))
    vis = (np.arange(2**10) + 1j * np.arange(2**10)).astype(np.complex128)
    with open(tmp_csv, "a") as fh:
        products.append_visibility(fh, vis)
        products.append_visibility(fh, vis * 2)
    out = np.loadtxt(tmp_csv, dtype=np.complex128, delimiter=",", skiprows=2)
    assert out.shape == (2, 2**10)
    np.testing.assert_allclose(out[1], vis * 2)


def test_continuum_header_single_skiprow(tmp_csv):
    cfg = CorrelatorConfig(mode="CONTINUUM", num_samp=2**14, nbins=2**10,
                           clamp_num_samp=False)
    products.write_metadata(tmp_csv, cfg)
    with open(tmp_csv, "a") as fh:
        for k in range(3):
            products.append_visibility(fh, np.complex128(k + 1j))
    out = np.loadtxt(tmp_csv, dtype=np.complex128, delimiter=",", skiprows=1)
    assert out.shape == (3,)
    assert products.skiprows_for_mode("continuum") == 1
    assert products.skiprows_for_mode("SPECTRUM") == 2


def test_test_mode_header_carries_sweep_step(tmp_csv):
    cfg = CorrelatorConfig(mode="TEST", num_samp=2**14, nbins=2**10,
                           clamp_num_samp=False)
    products.write_metadata(tmp_csv, cfg)
    md = products.parse_metadata(tmp_csv)
    # fixes the reference's (1/fc)/10 vs (1/fc)/2 mismatch (SURVEY.md §2.4)
    assert float(md["sweep_step"]) == pytest.approx((1 / 1.4204e9) / 2)


def test_nbl_matrix_rows(tmp_csv):
    cfg = CorrelatorConfig(mode="SPECTRUM", num_samp=2**14, nbins=16,
                           nchan=4, clamp_num_samp=False)
    products.write_metadata(tmp_csv, cfg)
    md = products.parse_metadata(tmp_csv)
    assert md["nchan"] == "4"
    vis = np.ones((6, 16), dtype=np.complex128)  # 4 ch -> 6 baselines
    with open(tmp_csv, "a") as fh:
        products.append_visibility(fh, vis)
    out = np.loadtxt(tmp_csv, dtype=np.complex128, delimiter=",", skiprows=2)
    assert out.shape == (6, 16)


def test_load_products_roundtrip(tmp_csv):
    cfg = CorrelatorConfig(mode="CONTINUUM", num_samp=2**14, nbins=2**10,
                           clamp_num_samp=False)
    products.write_metadata(tmp_csv, cfg)
    with open(tmp_csv, "a") as fh:
        products.append_visibility(fh, np.complex128(3 + 4j))
    md, data = products.load_products(tmp_csv)
    assert md["mode"] == "CONTINUUM"
    assert data == 3 + 4j


def test_visibility_writer_thread(tmp_csv):
    cfg = CorrelatorConfig(mode="CONTINUUM", num_samp=2**14, nbins=2**10,
                           clamp_num_samp=False)
    products.write_metadata(tmp_csv, cfg)
    q = Queue()
    active = threading.Event()
    active.set()
    w = products.VisibilityWriter(tmp_csv, q, active_fn=active.is_set).start()
    for k in range(5):
        q.put(np.complex128(k))
    time.sleep(0.3)
    active.clear()
    w.join(2.0)
    assert w.rows_written == 5
    _, data = products.load_products(tmp_csv)
    assert data.shape == (5,)


def test_reads_reference_written_file(tmp_path):
    """A CSV written the way the REFERENCE writes it (no sweep_step field,
    reference header order — effex.py:671-684) loads through our reader."""
    path = str(tmp_path / "ref.csv")
    nbins, bw, fc = 64, 2.4e6, 1.4204e9
    with open(path, "w") as fh:
        fh.write("run_time:60,bandwidth:2400000.0,frequency:1420400000.0,"
                 "num_samp:262144,resolution:64,gain:49.6,mode:SPECTRUM\n")
        freqs = np.fft.fftshift(np.fft.fftfreq(nbins, d=1 / bw)) + fc
        np.savetxt(fh, [freqs], delimiter=",")
        vis = (np.arange(nbins) + 1j).astype(np.complex128)
        np.savetxt(fh, [vis], delimiter=",")
    md, data = products.load_products(path)
    assert md["mode"] == "SPECTRUM" and md["gain"] == "49.6"
    assert data.shape == (nbins,)
    np.testing.assert_allclose(data.imag, 1.0)


def test_visualize_single_spectrum_row():
    """A one-row SPECTRUM product loads 1-D (np.loadtxt squeezes);
    visualize must promote it to a [1, nbins] waterfall instead of
    crashing with IndexError (r2 review finding)."""
    import matplotlib
    matplotlib.use("Agg")
    from fxtpu.post_process import visualize
    rng = np.random.default_rng(1)
    vis = (rng.normal(size=64) + 1j * rng.normal(size=64))
    fig = visualize(vis, rate=2.4e6, fc=1.42e9, nfft=64, mode="SPECTRUM",
                    show=False)
    assert fig is not None
    vis2 = rng.normal(size=(5, 64)) + 1j * rng.normal(size=(5, 64))
    fig = visualize(vis2, rate=2.4e6, fc=1.42e9, nfft=64, mode="SPECTRUM",
                    show=False)
    assert fig is not None
