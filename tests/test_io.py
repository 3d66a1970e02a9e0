"""I/O round-trips: VTI/PVTI, FLASH HDF5, PROPACEOS, ray dumps, imaging."""

import numpy as np
import pytest

from synthpy_tpu.analysis import Image
from synthpy_tpu.io import (
    export_pvti,
    export_scalar_field,
    hdf_readin,
    load_histograms,
    load_rays,
    read_integral_quantities,
    read_propaceos,
    read_pvti,
    read_vti,
    save_histograms,
    save_rays,
    write_vti,
)


@pytest.mark.parametrize("compress", [False, True])
def test_vti_roundtrip(tmp_path, compress):
    rng = np.random.default_rng(0)
    arr = rng.normal(size=(12, 10, 8)).astype(np.float64)
    fname = str(tmp_path / "field.vti")
    write_vti(fname, arr, spacing=(0.5, 1.0, 2.0), compress=compress)
    cells, shape, spacing = read_vti(fname)
    assert shape == (12, 10, 8)
    np.testing.assert_allclose(spacing, [0.5, 1.0, 2.0])
    np.testing.assert_array_equal(cells, arr)


def test_pvti_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    arr = rng.normal(size=(16, 16, 16)).astype(np.float32)
    coords = tuple(np.linspace(-1e-3, 1e-3, 16) for _ in range(3))
    pvti = export_scalar_field(arr, coords,
                               fname=str(tmp_path / "plasma"))
    cells, shape, spacing = read_pvti(pvti)
    assert shape == (16, 16, 16)
    np.testing.assert_array_equal(cells, arr)


def test_export_pvti_reference_signature(tmp_path):
    arr = np.ones((8, 8, 8))
    pvti = export_pvti(arr, fname=str(tmp_path / "ref"), extent_x=1e-3,
                       extent_y=1e-3, extent_z=2e-3)
    cells, shape, _ = read_pvti(pvti)
    assert shape == (8, 8, 8)
    np.testing.assert_array_equal(cells, arr)


def test_domain_export_roundtrip(tmp_path):
    from synthpy_tpu.fields import ScalarDomain

    d = ScalarDomain(2e-3, 12).test_lens(ne_0=1e24, LR=0.5e-3)
    pvti = d.export_scalar_field(fname=str(tmp_path / "dom"))
    cells, shape, _ = read_pvti(pvti)
    np.testing.assert_allclose(cells, np.asarray(d.ne), rtol=1e-6)


def test_flash_hdf_readin(tmp_path):
    """Synthetic 2-block FLASH-like file at two refinement levels."""
    import h5py

    nb = 2  # two leaf blocks tiling the domain along x
    nxb = nyb = nzb = 4
    fname = str(tmp_path / "flash_hdf5_plt_cnt_0000")
    with h5py.File(fname, "w") as f:
        f["node type"] = np.array([1, 1])
        f["refine level"] = np.array([1, 1])
        # domain [0,1]x[0,1]x[0,1]; two base blocks split x in half
        bbox = np.zeros((nb, 3, 2))
        bbox[0] = [[0, 0.5], [0, 1], [0, 1]]
        bbox[1] = [[0.5, 1], [0, 1], [0, 1]]
        f["bounding box"] = bbox
        dens = np.zeros((nb, nzb, nyb, nxb))
        dens[0] = 1.0
        dens[1] = 2.0
        f["dens"] = dens
        f["ye"] = np.full((nb, nzb, nyb, nxb), 0.5)
        f["sumy"] = np.full((nb, nzb, nyb, nxb), 1.0)

    ne, dims, spacing = hdf_readin(fname)
    assert tuple(dims) == (8, 4, 4)
    expect_lo = 6.022e23 * 1.0 * 0.5
    expect_hi = 6.022e23 * 2.0 * 0.5
    np.testing.assert_allclose(ne[:4], expect_lo)
    np.testing.assert_allclose(ne[4:], expect_hi)


def test_read_propaceos(tmp_path):
    """Craft a minimal PROPACEOS-format file and parse it back."""
    n_temp, n_dens, n_groups = 10, 20, 9
    temps = np.linspace(1, 100, n_temp)
    dens = np.logspace(16, 20, n_dens)
    groups = np.linspace(0.1, 10, n_groups + 1)
    zf = np.arange(n_temp * n_dens, dtype=float).reshape(n_temp, n_dens)

    def lines10(vals):
        out = []
        vals = list(vals)
        for i in range(0, len(vals), 10):
            out.append(" ".join(f"{v:.6e}" for v in vals[i:i + 10]))
        return out

    content = ["header"] * 38
    content.append(str(n_temp))
    content += lines10(temps)
    content.append(str(n_dens))
    content += lines10(dens)
    # skipped duplicated grid section: n_temp//10 + n_dens//10 + 2 + 5 lines
    content += ["skip"] * (n_temp // 10 + n_dens // 10 + 2 + 5)
    content.append(str(n_groups))
    content.append("skip")
    content += lines10(groups)
    content.append("ZF table")
    for t in range(n_temp):
        content += lines10(zf[t])
    fname = str(tmp_path / "prp")
    with open(fname, "w") as f:
        f.write("\n".join(content) + "\n")

    data = read_propaceos(fname, need_zf_table=True)
    np.testing.assert_allclose(data["temperatures"], temps, rtol=1e-5)
    np.testing.assert_allclose(data["densities"], dens, rtol=1e-5)
    np.testing.assert_allclose(data["rad_groups"], groups, rtol=1e-5)
    np.testing.assert_allclose(data["zf_table"], zf, rtol=1e-5)


def test_integral_quantities(tmp_path):
    fname = str(tmp_path / "iq.txt")
    with open(fname, "w") as f:
        f.write("#time[s] #energy[J] #mass[g]\n")
        f.write("0.0 1.5 2.0\n1.0 2.5 3.0\n")
    data = read_integral_quantities(fname)
    np.testing.assert_allclose(data["time"], [0.0, 1.0])
    np.testing.assert_allclose(data["energy"], [1.5, 2.5])


def test_ray_and_histogram_dumps(tmp_path):
    s = np.arange(36).reshape(9, 4).astype(np.float32)
    f = save_rays(str(tmp_path / "rays"), s)
    np.testing.assert_array_equal(load_rays(f), s)
    H = np.ones((4, 5))
    f2 = save_histograms(str(tmp_path / "h"), shadow=H, schlieren=2 * H)
    out = load_histograms(f2)
    np.testing.assert_array_equal(out["schlieren"], 2 * H)


def test_image_analysis():
    ny, nx = 64, 96
    yy, xx = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    data = np.exp(-((xx - 48) ** 2 + (yy - 32) ** 2) / 100.0)
    img = Image(data, mm_per_px=0.1)
    # origin at centre: px (48, 32) -> (0, 0) mm
    x_mm, y_mm = img.px_to_mm(48, 32)
    assert abs(x_mm - 0.05) < 0.06 and abs(y_mm) < 0.06
    s, vals = img.profile_line((-2.0, 0.0), (2.0, 0.0), n=81)
    assert abs(int(vals.argmax()) - 40) <= 1  # peak at line centre
    assert s[-1] == pytest.approx(4.0)
    norm = img.normalised()
    assert norm.data.max() == pytest.approx(1.0)
    assert img.rotate90().data.shape == (96, 64)


def test_image_rotate_shift_roundtrip():
    # arbitrary-angle rotation + sub-pixel shift, both bilinear; a smooth
    # blob survives rotate(a).rotate(-a) and shift(d).shift(-d) to ~1e-2
    rng = np.random.default_rng(3)
    ny = nx = 96
    yy, xx = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    data = np.exp(-((xx - 52) ** 2 + (yy - 40) ** 2) / 180.0)
    img = Image(data)
    back = img.rotate(7.3).rotate(-7.3)
    inner = np.s_[8:-8, 8:-8]
    assert np.abs(back.data - data)[inner].max() < 2e-2
    back2 = img.shift(3.4, -2.6).shift(-3.4, 2.6)
    assert np.abs(back2.data - data)[inner].max() < 2e-2
    # pure 90-degree special case agrees with rot90 on a centred square
    sq = Image(np.exp(-((xx - 47.5) ** 2 + (yy - 47.5) ** 2) / 300.0))
    np.testing.assert_allclose(sq.rotate(90.0).data[inner],
                               np.rot90(sq.data)[inner], atol=2e-2)


def test_rigid_registration_recovers_pose():
    # a synthetic "shot": known mount rotation + beam walk-off applied to
    # a structured frame; register() must recover both to sub-pixel /
    # sub-tenth-degree so mov.rotate(-a).shift(-dx,-dy) aligns with ref
    from synthpy_tpu.analysis import register, register_translation

    rng = np.random.default_rng(11)
    n = 128
    base = rng.standard_normal((n, n))
    # smooth it (structured, band-limited like fringe/shadow frames)
    k = np.fft.fftfreq(n)
    lp = np.exp(-(k[:, None] ** 2 + k[None, :] ** 2) / (2 * 0.06**2))
    ref = np.real(np.fft.ifft2(np.fft.fft2(base) * lp))
    ref_im = Image(ref)

    dx_t, dy_t, ang_t = 4.7, -3.2, 2.4
    shot = ref_im.rotate(ang_t).shift(dx_t, dy_t)

    dx, dy, peak = register_translation(ref_im, ref_im.shift(2.5, -1.25))
    assert abs(dx - 2.5) < 0.25 and abs(dy + 1.25) < 0.25

    ang, (sx, sy), pk = register(ref_im, shot, angle_range=(-6, 6))
    assert abs(ang - ang_t) < 0.3
    # the recovered shift lives in the de-rotated frame: R(-ang) @ d
    c, s = np.cos(np.deg2rad(-ang)), np.sin(np.deg2rad(-ang))
    ex, ey = c * dx_t + s * dy_t, -s * dx_t + c * dy_t
    assert abs(sx - ex) < 0.6 and abs(sy - ey) < 0.6
    assert pk > 0.9
    aligned = shot.rotate(-ang).shift(-sx, -sy)
    inner = np.s_[16:-16, 16:-16]
    res = np.linalg.norm((aligned.data - ref)[inner])
    assert res / np.linalg.norm(ref[inner]) < 0.12


def test_fringe_phase_extraction():
    """Synthesize fringes with a known phase bump; recover it."""
    from synthpy_tpu.analysis.fringes import (
        carrier_frequency,
        extract_phase,
        phase_difference,
    )

    ny, nx = 128, 160
    y, x = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    phi = 1.2 * np.exp(-((x - 80) ** 2 + (y - 64) ** 2) / 400.0)
    kx = 2 * np.pi * 12 / nx  # 12 fringes across
    shot = 10 + 5 * np.cos(kx * x + phi)
    bkg = 10 + 5 * np.cos(kx * x)

    fi, fj = carrier_frequency(bkg)
    assert (fi, fj) == (0, 12)

    dphi = phase_difference(shot, bkg)
    # recovered bump matches (away from edges; filter smooths slightly)
    inner = np.s_[40:90, 55:105]
    assert np.abs(dphi[inner] - phi[inner]).max() < 0.25
    assert abs(dphi[64, 80] - 1.2) < 0.1

    # direct extraction carries the linear carrier out
    p = extract_phase(shot, (fi, fj))
    assert np.isfinite(p).all()


def test_fringe_visibility_marks_depleted_pixels():
    """Sideband amplitude = fringe confidence: ~1 where fringes are
    clean, ~0 where the shot's modulation is gone (refraction-depleted
    pixels demodulate to garbage phase but near-zero visibility)."""
    from synthpy_tpu.analysis.fringes import extract_phase, phase_difference

    ny, nx = 128, 160
    y, x = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    phi = 1.2 * np.exp(-((x - 80) ** 2 + (y - 64) ** 2) / 400.0)
    kx = 2 * np.pi * 12 / nx
    # kill the fringe modulation in a band (keep the mean intensity)
    dead = (x > 20) & (x < 40) & (y > 30) & (y < 98)
    shot = 10 + np.where(dead, 0.0, 5.0) * np.cos(kx * x + phi)
    bkg = 10 + 5 * np.cos(kx * x)

    p, a = extract_phase(shot, (0, 12), return_amplitude=True)
    assert np.isfinite(p).all() and (a >= 0).all()

    dphi, vis = phase_difference(shot, bkg, return_visibility=True)
    assert abs(dphi[64, 80] - 1.2) < 0.1
    assert vis[64, 140] > 0.8          # clean region: near-unit ratio
    assert vis[64, 30] < 0.3           # dead band: low confidence
    # non-visibility call shape/value unchanged
    d2 = phase_difference(shot, bkg)
    assert np.array_equal(d2, dphi)


def test_vti_base64_appended_reader(tmp_path):
    """Reader handles base64-encoded appended payloads (VTK writers vary)."""
    import base64
    import struct

    arr = np.arange(60, dtype=np.float32).reshape(3, 4, 5)
    raw = np.asfortranarray(arr).tobytes(order="F")
    payload = base64.b64encode(struct.pack("<Q", len(raw)) + raw)
    content = (
        '<?xml version="1.0"?>\n'
        '<VTKFile type="ImageData" version="1.0" byte_order="LittleEndian"'
        ' header_type="UInt64">\n'
        '  <ImageData WholeExtent="0 3 0 4 0 5" Origin="0 0 0"'
        ' Spacing="1 1 1">\n'
        '    <Piece Extent="0 3 0 4 0 5">\n'
        '      <CellData Scalars="v">\n'
        '        <DataArray type="Float32" Name="v" format="appended"'
        ' offset="0"/>\n'
        '      </CellData>\n'
        '    </Piece>\n'
        '  </ImageData>\n'
        '  <AppendedData encoding="base64">\n_'
    ).encode() + payload + b"\n  </AppendedData>\n</VTKFile>\n"
    fname = str(tmp_path / "b64.vti")
    with open(fname, "wb") as f:
        f.write(content)
    cells, shape, spacing = read_vti(fname)
    assert shape == (3, 4, 5)
    np.testing.assert_array_equal(cells, arr)


def test_ray_dump_contract(tmp_path):
    """Round-2 closure: ray dumps carry a metadata sidecar, are validated
    on load, and common caller slips are caught."""
    import pytest

    from synthpy_tpu.io.rays import load_ray_meta

    s = np.arange(24).reshape(6, 4).astype(np.float64)
    f = save_rays(str(tmp_path / "r6"), s, probing_direction="z",
                  meta={"note": "unit"})
    meta = load_ray_meta(f)
    assert meta["kind"] == "minimal" and meta["n_rays"] == 4
    assert meta["probing_direction"] == "z" and meta["note"] == "unit"
    np.testing.assert_array_equal(load_rays(f), s)

    # transposed array is the most common slip ((Np, rows) with an
    # invalid row count but a valid column count)
    with pytest.raises(ValueError, match="transposed"):
        save_rays(str(tmp_path / "bad"), np.zeros((11, 9)))
    # wrong row count
    with pytest.raises(ValueError, match="rows"):
        save_rays(str(tmp_path / "bad2"), np.zeros((5, 4)))
    # sidecar disagreement (file overwritten mid-campaign)
    np.save(f, np.zeros((6, 9), np.float32))
    with pytest.raises(ValueError, match="sidecar"):
        load_rays(f)
    # all rays aperture-killed -> warn
    f3 = save_rays(str(tmp_path / "dead"), np.full((4, 3), np.nan))
    with pytest.warns(UserWarning, match="finite"):
        load_rays(f3)


def test_unwrap_2d_anchored_and_rectify():
    """Anchored 2-D unwrap recovers a >2pi smooth map exactly; the
    rectifier removes the anchor's 2*pi*k ambiguity against a
    known-zero region; corner-anchored unwrap matches when the corner
    is clean."""
    from synthpy_tpu.analysis.fringes import (rectify_phase_offset,
                                              unwrap_2d)

    ny, nx = 96, 80
    y, x = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    true = -9.5 * np.exp(-((x - 40) ** 2 + (y - 48) ** 2) / 500.0)
    wrapped = np.angle(np.exp(1j * true))

    # corner anchor: corner phase ~0 -> absolute directly
    u_corner = unwrap_2d(wrapped)
    np.testing.assert_allclose(u_corner, true, atol=1e-9)

    # centre anchor: off by a constant 2*pi*k (k = wrap count of the
    # -9.5 rad centre), restored by rectifying against the true-zero rim
    u_c = unwrap_2d(wrapped, anchor=(48, 40))
    k = np.round((u_c - true)[0, 0] / (2 * np.pi))
    np.testing.assert_allclose(u_c, true + 2 * np.pi * k, atol=1e-9)
    rim = np.hypot(y - 48, x - 40) > 35
    u_r = rectify_phase_offset(u_c, rim)
    np.testing.assert_allclose(u_r, true, atol=1e-9)


def test_pvti_scene_drives_upload_route_identically(tmp_path):
    """The production data-driven path (examples/magpie_1024_full_physics
    --tier pvti): a multi-channel scene written to per-channel .pvti
    files, read back into host arrays, and traced through the upload
    pack route must be BITWISE-identical to tracing the in-memory host
    arrays directly (f32 survives the VTK raw-appended roundtrip
    exactly)."""
    import jax
    import jax.numpy as jnp

    from synthpy_tpu import pipeline
    from synthpy_tpu.fields import ScalarDomain
    from synthpy_tpu.tracer import init_beam
    from synthpy_tpu.tracer.zscan import build_segment_pack_upload

    dim, ext = 17, 5e-3
    x = np.linspace(-ext, ext, dim, dtype=np.float32)
    X, Y, Z = x[:, None, None], x[None, :, None], x[None, None, :]
    rng = np.random.default_rng(3)
    ne = (2e24 * np.exp(-(X**2 + Y**2 + 0.5 * Z**2) / (2e-3) ** 2)
          ).astype(np.float32)
    Te = (50.0 + 5.0 * rng.standard_normal((dim,) * 3)).astype(np.float32)
    Zb = np.full((dim,) * 3, 4.0, np.float32)
    B = np.zeros((dim,) * 3 + (3,), np.float32)
    B[..., 1] = 2.0

    def make_domain(ne_a, Te_a, Z_a, B_a):
        d = ScalarDomain(2 * ext, dim)
        d.external_ne(ne_a, host=True)
        d.external_B(B_a, host=True)
        d.external_Te(Te_a, host=True)
        d.external_Z(Z_a, host=True)
        d.inv_brems = True
        d.phaseshift = True
        return d

    # on-disk route: one .pvti per channel, read back
    coords = (x, x, x)
    chans = {"ne": ne, "Te": Te, "Z": Zb,
             "Bx": B[..., 0], "By": B[..., 1], "Bz": B[..., 2]}
    for name, arr in chans.items():
        export_scalar_field(np.ascontiguousarray(arr), coords,
                            fname=str(tmp_path / name), name=name)

    def rd(name):
        arr, _, _ = read_pvti(str(tmp_path / (name + ".pvti")))
        return np.asarray(arr, np.float32)

    B2 = np.stack([rd("Bx"), rd("By"), rd("Bz")], axis=-1)
    d_mem = make_domain(ne, Te, Zb, B)
    d_disk = make_domain(rd("ne"), rd("Te"), rd("Z"), B2)

    s0 = init_beam(jax.random.PRNGKey(0), 2000, 2.5e-3, 0.0, ext,
                   "circular")
    imgs = []
    for d in (d_mem, d_disk):
        spack = build_segment_pack_upload(d, K=4, dtype="int4",
                                          plane_batch=4, dither=7)
        im = pipeline.run(d, s0, solver="zscan_seg", spack=spack,
                          diagnostic="shadowgraphy", bins=(64, 48),
                          critical_guard=None, integrator="rk2s2")
        imgs.append(np.asarray(im))
    np.testing.assert_array_equal(imgs[0], imgs[1])
