"""CLI smoke tests for the trace and turb_gen drivers."""

import numpy as np

from synthpy_tpu.cli import trace as trace_cli
from synthpy_tpu.cli import turb_gen as turb_cli
from synthpy_tpu.io import load_histograms, read_pvti


def test_turb_gen_and_trace_pipeline(tmp_path):
    out_field = str(tmp_path / "field")
    summary = turb_cli.main([
        "-p", "3.6667", "-e", "1e-3", "-r", "16", "--ne0", "1e24",
        "-o", out_field, "--spectrum-check"])
    assert summary["shape"] == [32, 32, 32]
    assert -6.0 < summary["fitted_slope"] < -1.5

    ne, shape, spacing = read_pvti(summary["output"])
    assert shape == (32, 32, 32)
    assert ne.min() > 0  # ne0 + amplitude*f stays positive-ish for f in [-1,1]

    out_img = str(tmp_path / "shadow")
    res = trace_cli.main([
        "-d", "16", "-r", "2000", "--pvti", summary["output"],
        "--diagnostic", "shadowgraphy", "--bin-scale", "32",
        "-o", out_img])
    assert res["image_sum"] > 0
    H = load_histograms(out_img + ".npz")["shadowgraphy"]
    assert H.shape == (2574 // 32, 3448 // 32)


def test_trace_cli_analytic_interferometry(tmp_path):
    res = trace_cli.main([
        "-d", "24", "-r", "3000", "--ne-type", "test_lens",
        "--diagnostic", "interferometry", "--bin-scale", "32",
        "--solver", "time"])
    assert res["image_sum"] > 0


def test_trace_cli_multi_diagnostic(tmp_path):
    out = str(tmp_path / "multi")
    res = trace_cli.main([
        "-d", "24", "-r", "3000", "--ne-type", "test_lens",
        "--diagnostic", "shadowgraphy,schlieren_df,interferometry",
        "--bin-scale", "64", "-o", out])
    assert res["image_sum"] is not None
    h = load_histograms(out + ".npz")
    assert sorted(h) == ["interferometry", "schlieren_df", "shadowgraphy"]
    assert h["shadowgraphy"].sum() == 3000.0
    for v in h.values():
        assert v.shape == (2574 // 64, 3448 // 64)


def test_trace_cli_no_diagnostic(tmp_path):
    rays_file = str(tmp_path / "rays.npy")
    res = trace_cli.main([
        "-d", "16", "-r", "500", "--ne-type", "test_null",
        "--diagnostic", "none", "--save-rays", rays_file])
    rf = np.load(rays_file)
    assert rf.shape == (4, 500)
    np.testing.assert_allclose(rf[1], 0.0, atol=1e-12)


def test_turb_gen_fft_and_cos_methods(tmp_path):
    s1 = turb_cli.main(["-p", "3.0", "-r", "8", "--method", "fft",
                        "-o", str(tmp_path / "f")])
    assert s1["shape"] == [17, 17, 17]  # (2N+1)^3
    ne, shape, _ = read_pvti(s1["output"])
    assert shape == (17, 17, 17)

    s2 = turb_cli.main(["-p", "3.0", "-e", "1.0", "-r", "8", "--method",
                        "cos", "--nmodes", "20", "-o", str(tmp_path / "c")])
    assert s2["shape"] == [16, 16, 16]


def test_export_compressed_roundtrip(tmp_path):
    from synthpy_tpu.io import export_scalar_field

    rng = np.random.default_rng(5)
    arr = rng.normal(size=(10, 10, 10))
    coords = tuple(np.linspace(-1, 1, 10) for _ in range(3))
    pvti = export_scalar_field(arr, coords, fname=str(tmp_path / "cz"),
                               compress=True)
    from synthpy_tpu.io import read_pvti as _rp

    cells, shape, _ = _rp(pvti)
    np.testing.assert_array_equal(cells, arr)


def test_trace_cli_int8_pack():
    """--pack-dtype int8 routes the quantised segment tables through the
    one-call pipeline; counts conserved vs the bf16 default."""
    ref = trace_cli.main([
        "-d", "17", "-r", "2000", "--solver", "zscan_seg",
        "--integrator", "rk2s2", "--diagnostic", "shadowgraphy",
        "--bin-scale", "64"])
    res = trace_cli.main([
        "-d", "17", "-r", "2000", "--solver", "zscan_seg",
        "--pack-dtype", "int8", "--integrator", "rk2s2",
        "--diagnostic", "shadowgraphy", "--bin-scale", "64"])
    # quantisation may push a handful of edge rays across the detector
    # boundary; counts agree to a fraction of a percent
    assert abs(res["image_sum"] - ref["image_sum"]) <= 0.01 * ref["image_sum"]


def test_campaign_cli_end_to_end(tmp_path):
    """Config-driven campaign: chunked run, exact coherent accumulation,
    checkpoint resume, and determinism of the accumulated images."""
    import json

    from synthpy_tpu.cli import campaign as campaign_cli

    cfg = {
        "seed": 3,
        "domain": {"dim": 17, "length": 2e-3, "ne_type": "test_lens",
                   "ne_kwargs": {"ne_0": 5e24, "LR": 1.5e-3}},
        "beam": {"size": 0.6e-3},
        "trace": {"total_rays": 4000, "chunk_rays": 1500,
                  "integrator": "rk2s2"},
        "diagnostics": ["shadowgraphy", "interferometry"],
        "detector": {"bin_scale": 64},
        "output": {"dir": str(tmp_path / "out")},
    }
    cpath = str(tmp_path / "cfg.json")
    with open(cpath, "w") as f:
        json.dump(cfg, f)

    s1 = campaign_cli.main([cpath, "--quiet"])
    assert s1["total_rays"] == 4000 and s1["chunk_rays"] == 1500
    h = load_histograms(s1["images"])
    assert sorted(h) == ["interferometry", "shadowgraphy"]
    assert h["shadowgraphy"].sum() == 4000.0          # counts conserved
    assert h["interferometry"].dtype == np.float32 or h[
        "interferometry"].ndim == 2                   # finalized image

    # a completed checkpoint resumes to the identical result (no rework)
    s2 = campaign_cli.main([cpath, "--quiet"])
    h2 = load_histograms(s2["images"])
    np.testing.assert_array_equal(h2["interferometry"],
                                  h["interferometry"])

    # --fresh recomputes from scratch, deterministically
    s3 = campaign_cli.main([cpath, "--quiet", "--fresh"])
    h3 = load_histograms(s3["images"])
    np.testing.assert_array_equal(h3["shadowgraphy"], h["shadowgraphy"])
    np.testing.assert_array_equal(h3["interferometry"],
                                  h["interferometry"])


def test_campaign_cli_rejects_typos(tmp_path):
    import json

    import pytest

    from synthpy_tpu.cli import campaign as campaign_cli

    cpath = str(tmp_path / "bad.json")
    with open(cpath, "w") as f:
        json.dump({"trace": {"total_rays": 100, "integrater": "rk2"}}, f)
    with pytest.raises(SystemExit, match="integrater"):
        campaign_cli.main([cpath, "--quiet"])
    with open(cpath, "w") as f:
        json.dump({"diagnostics": ["shadowgraphy", "shadography"],
                   "trace": {"total_rays": 100}}, f)
    with pytest.raises(SystemExit, match="shadography"):
        campaign_cli.main([cpath, "--quiet",
                           "-o", str(tmp_path / "o2")])


def test_trace_cli_mesh_grid_and_rays():
    """--mesh grid=4,rays=2 runs the one-command multi-chip path (field
    sharded + ray DP, the mpiexec replacement) and matches the
    single-device image; bad specs are rejected."""
    import pytest

    argv = ["-d", "32", "-r", "2000", "--ne-type", "test_lens",
            "--solver", "zscan_seg", "--diagnostic", "shadowgraphy",
            "--bin-scale", "64"]
    ref = trace_cli.main(argv)
    res = trace_cli.main(argv + ["--mesh", "grid=4,rays=2"])
    assert res["image_sum"] == ref["image_sum"]

    res_dp = trace_cli.main(argv + ["--mesh", "rays=8"])
    assert res_dp["image_sum"] == ref["image_sum"]

    with pytest.raises(SystemExit):
        trace_cli.main(argv + ["--mesh", "bogus"])
    with pytest.raises(SystemExit):
        trace_cli.main(argv + ["--mesh", "rays=999"])
    with pytest.raises(SystemExit):
        trace_cli.main(["-d", "16", "-r", "100", "--diagnostic", "none",
                        "--mesh", "rays=8"])


def test_trace_cli_pack_dither_requires_quantised_dtype():
    """--pack-dither on the default bf16/stride-1 config must error, not
    silently no-op (the validation lives above the spack-build block)."""
    import pytest

    with pytest.raises(SystemExit, match="pack-dither"):
        trace_cli.main(["-d", "16", "-r", "100", "--solver", "zscan_seg",
                        "--pack-dither", "7"])


def test_campaign_cli_rejects_stride_rk4_and_bf16_dither(tmp_path):
    """Campaign configs get the same plane_stride/integrator and dither
    validation as the trace CLI (silent rk4-on-decimated-pack is the
    degraded-accuracy trap both surfaces must refuse)."""
    import json

    import pytest

    from synthpy_tpu.cli import campaign as campaign_cli

    def cfg_file(trace_over):
        tr = {"total_rays": 500, "chunk_rays": 500, "solver": "zscan_seg"}
        tr.update(trace_over)
        cfg = {"domain": {"dim": 16}, "trace": tr,
               "output": {"dir": str(tmp_path / "out")}}
        fp = tmp_path / "c.json"
        fp.write_text(json.dumps(cfg))
        return str(fp)

    with pytest.raises(SystemExit, match="even-stride"):
        campaign_cli.main([cfg_file({"plane_stride": 2,
                                     "integrator": "rk4"})])
    with pytest.raises(SystemExit, match="pack_dither"):
        campaign_cli.main([cfg_file({"pack_dither": 3})])


def test_campaign_cli_mesh_matches_single_device(tmp_path):
    """trace.mesh in a campaign config runs the chunked multi-chip path
    (grid-sharded pack + ray DP) and matches the single-device images —
    including the EXACT cross-chunk coherent accumulation."""
    import json

    from synthpy_tpu.cli import campaign as campaign_cli

    base = {"domain": {"dim": 32, "ne_type": "test_lens",
                       "ne_kwargs": {"ne_0": 5e24, "LR": 1.5e-3}},
            "trace": {"total_rays": 3000, "chunk_rays": 1000,
                      "solver": "zscan_seg", "integrator": "rk2s2"},
            "diagnostics": ["shadowgraphy", "interferometry"],
            "detector": {"bin_scale": 64},
            "output": {"dir": str(tmp_path / "ref"), "checkpoint": None}}
    fp = tmp_path / "c.json"
    fp.write_text(json.dumps(base))
    ref = campaign_cli.main([str(fp), "--quiet"])

    base["trace"]["mesh"] = "grid=4,rays=2"
    base["output"]["dir"] = str(tmp_path / "mesh")
    fp.write_text(json.dumps(base))
    res = campaign_cli.main([str(fp), "--quiet"])

    a = np.load(tmp_path / "ref" / "images.npz")
    b = np.load(tmp_path / "mesh" / "images.npz")
    np.testing.assert_array_equal(b["shadowgraphy"], a["shadowgraphy"])
    np.testing.assert_allclose(b["interferometry"], a["interferometry"],
                               atol=1e-4 * float(a["interferometry"].max()))
    assert res["image_sums"]["shadowgraphy"] == 3000.0


def test_trace_cli_mesh_grid_nondivisible_int8():
    """--mesh grid=4 on a 30^3 field (30 % 4 != 0) with an int8 pack:
    the pack builds unsharded, pipeline pads the tables with zero a-rows
    and the sharded march matches the single-device image."""
    argv = ["-d", "30", "-r", "2000", "--ne-type", "test_lens",
            "--solver", "zscan_seg", "--pack-dtype", "int8",
            "--integrator", "rk2s2", "--diagnostic", "shadowgraphy",
            "--bin-scale", "64"]
    ref = trace_cli.main(argv)
    res = trace_cli.main(argv + ["--mesh", "grid=4,rays=2"])
    assert res["image_sum"] == ref["image_sum"]


def test_trace_cli_pp_axis_matches_single_device():
    """--mesh seg=8 --pp-axis seg: the one-command depth-pipelined path
    equals the single-device image (segment padding + skip, ray-count
    conserved)."""
    import pytest

    argv = ["-d", "32", "-r", "2000", "--ne-type", "test_lens",
            "--solver", "zscan_seg", "--integrator", "rk2s2",
            "--diagnostic", "shadowgraphy", "--bin-scale", "64"]
    ref = trace_cli.main(argv)
    res = trace_cli.main(argv + ["--mesh", "seg=8", "--pp-axis", "seg"])
    assert res["image_sum"] == ref["image_sum"]

    with pytest.raises(SystemExit, match="mutually exclusive"):
        trace_cli.main(argv + ["--mesh", "grid=4,seg=2", "--pp-axis",
                               "seg", "--grid-axis", "grid"])
    with pytest.raises(SystemExit, match="zscan_seg"):
        trace_cli.main(["-d", "16", "-r", "100", "--solver", "time",
                        "--mesh", "seg=8", "--pp-axis", "seg"])
