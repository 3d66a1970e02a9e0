"""Test bootstrap: simulate an 8-device TPU-style mesh on CPU.

This formalises the reference's laptop-testing pattern
(--xla_force_host_platform_device_count, reference src/simulator/
config.py:108) as the standard way to unit-test sharding without real
multi-chip hardware.

Note: the host environment may import jax at interpreter startup (TPU
sitecustomize), so the platform is switched via jax.config rather than env
vars. XLA_FLAGS is still honoured because the CPU client is only
instantiated on first use, which happens after this file runs.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Make the repo root importable regardless of how pytest was invoked.
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

import pytest  # noqa: E402

# Long-running gates (>= ~9 s each on the 8-device CPU mesh, measured
# round 4): marked `slow` centrally so the default suite (`-m 'not slow'`,
# pyproject addopts) runs in minutes while CI / pre-merge runs everything
# with `-m ''`. Durations: scratch/suite_durations_r4.log.
_SLOW = {
    "test_remat_gradients_match_plain_gradients",
    "test_differentiable_faraday_rendering",
    "test_dithered_quantisation_routes_and_accuracy",
    "test_render_gradient_matches_finite_difference",
    "test_coherent_renderer_produces_fringes_and_gradients",
    "test_zscan_segments_blocked_matches_unblocked",
    "test_phase_map_bench_linear_zeroed_and_differentiable",
    "test_int8_pack_matches_float_pack",
    "test_multihost_two_process_cpu",
    "test_pipeline_run_pp_axis_matches_single_device",
    "test_inverse_recovers_lens_amplitude",
    "test_batched_coherent_exact_vs_single_program",
    "test_sharded_pack_build_bit_identical_and_composes",
    "test_graft_entry_surface",
    "test_bench_json_contract",
    "test_trace_cli_mesh_grid_and_rays",
    "test_rk2s4_images_close",
    "test_pp_tracer_rk2s2_sharded_chunks_bit_identical",
    "test_gridsharded_segment_march_bit_identical",
    "test_pipeline_images_via_composed_stages",
    "test_multi_matches_single[zscan_seg]",
    "test_streamed_march_bit_identical",
    "test_pipeline_run_grid_axis_int8_and_nondivisible_dims",
    "test_interferogram_to_density_loop",
    "test_weights_slab_mode_image_equivalent",
    "test_pipeline_run_grid_axis_matches_single_device",
    "test_ray_sharded_segment_trace_matches",
    "test_trace_cli_multi_diagnostic",
    "test_lens_converges_to_gridded_march",
    "test_wave_vs_ray_shadowgram_geometric_limit",
    "test_int4_pack_decode_exact_and_images_close",
    "test_turb_gen_fft_and_cos_methods",
    "test_decimated_pack_rk2s2_equals_rk2s4",
    "test_gridsharded_segment_tracer_int8_matches_single_device",
    "test_trace_cli_no_diagnostic",
    "test_radial_spectrum_1d_2d",
    "test_rk2s2_matches_rk4_and_images",
    "test_pipelined_segment_tracer_matches_single_device",
    "test_pipeline_run_grid_axis_coherent_matches",
    "test_weighted_stages_match_nan_filtered_histogram",
    "test_campaign_cli_mesh_matches_single_device",
    "test_shadowgraphy_exp_detL_reaches_the_bench",
    "test_pipeline_run_auto_batches_oversized_packs",
    # round-5 widening (VERDICT r4 #7): the 5.7-7.7 s band — parity/
    # equivalence gates whose dims don't affect what they gate, plus the
    # streamed x-ray gates. The default lane keeps at least one fast
    # gate per subsystem (e.g. test_zscan_segments_rk2_matches_rk4_and_
    # oracle stays default); the full suite (`-m ''`) runs everything.
    "test_turb_gen_and_trace_pipeline",
    "test_pipeline_run_mesh_equals_single_device",
    "test_trace_cli_analytic_interferometry",
    "test_legacy_solve_zscan_seg",
    "test_pipeline_run_mesh_coherent_and_time",
    "test_multichip_marches_int4_match_single_device",
    "test_pipeline_zscan_seg_equivalence",
    "test_rk2_non_cubic_grid",
    "test_pipeline_run_host_pack_streams",
    "test_grf_spectrum_slope_recovery",
    "test_zscan_segments_all_switches",
    "test_campaign_cli_end_to_end",
    "test_multi_matches_single[zscan]",
    "test_pipelined_segment_tracer_int8_matches_single_device",
    "test_streamed_int8_pack_matches_device_and_march",
    "test_rk2_matches_rk4_all_probing_directions[x]",
    "test_radiography_streamed_matches_dense",
    "test_point_projection_streamed_matches_dense_quadrature",
    "test_xray_survey_single_pass_matches_individual_streams",
    "test_pvti_scene_drives_upload_route_identically",
    # round-5 second widening (VERDICT r4 #7, measured
    # /tmp/suite_durations_r5.log -> scratch/suite_durations_r5.log):
    # the 5-15 s band that crept in with the r4/r5 builders. All are
    # parity/equivalence gates whose failure would also trip a faster
    # default-lane cousin: upload/synth builder parity keeps the f32
    # upload variant + test_full_physics_scale_builders_trace default;
    # chunking keeps test_streamed_march_ray_chunking; rk2-vs-rk4
    # keeps test_zscan_segments_rk2_matches_rk4_and_oracle and the [z]
    # probing direction; adaptive keeps oracle + null + local-amax.
    "test_synth_builder_matches_upload_builder[int8]",
    "test_synth_builder_matches_upload_builder[int4]",
    "test_pack_dtype_auto_advisor_and_pipeline_mode",
    "test_upload_builder_bit_identical_to_device_builder[int8]",
    "test_upload_builder_bit_identical_to_device_builder[int4]",
    "test_b_table_tiers_accuracy_and_host_build",
    "test_trace_cli_pp_axis_matches_single_device",
    "test_trace_cli_mesh_grid_nondivisible_int8",
    "test_pipeline_run_grid_axis_slab_weights_matches_single_device",
    "test_zscan_segments_ray_chunking",
    "test_decimate_quantise_commute",
    "test_decimated_rk2s4_stride8_image_equivalent",
    "test_pipeline_rk2_image_close_to_rk4",
    "test_zscan_segments_full_K_image_equivalence",
    "test_streamed_march_device_cache",
    "test_rk2_matches_rk4_all_probing_directions[y]",
    "test_three_solvers_agree",
    "test_polarimetry_gridded_solver_agrees_with_analytic",
    "test_pipeline_run_analytic_image_close_to_gridded",
    "test_fresnel_gaussian_beam_expands_correctly",
    # round-5b trim (VERDICT r4 #7, durations scratch/suite_durations_r5
    # .log): the quantised upload/synth builder parity gates keep their
    # f32 cousins in the default lane; the pp-axis CLI route keeps the
    # nondivisible-int8 CLI mesh gate; the advisor and B-table-tier
    # gates are envelope checks with fast smoke cousins.
    "test_synth_builder_matches_upload_builder[int8]",
    "test_synth_builder_matches_upload_builder[int4]",
    "test_upload_builder_bit_identical_to_device_builder[int8]",
    "test_upload_builder_bit_identical_to_device_builder[int4]",
    "test_pack_dtype_auto_advisor_and_pipeline_mode",
    "test_b_table_tiers_accuracy_and_host_build",
    "test_trace_cli_pp_axis_matches_single_device",
}
# A persistent XLA compilation cache for the suite was probed and
# FALSIFIED (round 5): cc.set_cache_dir makes warm re-runs ~3.4x
# faster on CPU, but the default lane is compile-bound on FIRST runs
# (fresh clone/CI), every cached load logs two cpu_aot_loader E-lines,
# and the cache would have to ship as committed binaries to help a
# fresh checkout. /tmp/cache_probe2.py.


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.name in _SLOW:
            item.add_marker(pytest.mark.slow)
