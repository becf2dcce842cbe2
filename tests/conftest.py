"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding/pjit paths are exercised without TPU hardware.

Note: this environment preloads jax at interpreter startup, so JAX_PLATFORMS
set here would be too late — we use jax.config.update instead, which takes
effect because no backend has been initialized yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")


# ---- fast/slow tiers -------------------------------------------------------
# `pytest -m "not slow"` is the fast gate (< ~2 min); the full suite stays the
# merge bar. Tier membership lives HERE (one list, measured by --durations),
# not scattered across files. Entries are nodeid suffixes: "file.py::test" or
# a class prefix "file.py::Class".
SLOW_TESTS = (
    "test_train.py::test_compose_res_half_matches_full",
    "test_warp_zline.py::TestZlineCompose::test_trainer_env_flag_equivalence",
    "test_quantize.py::TestRegistrarQuantized::test_sharded_matches_single_device",
    "test_train.py::test_npz_warm_start",
    "test_model.py::test_gradients_nonzero",
    "test_conv_pool.py::TestUnetIntegration::test_fused_unet_matches_plain",
    "test_integration.py::test_train_then_register_then_evaluate",
    "test_pool.py::test_odd_spatial_dims_gradient_matches_nn_max_pool",
    "test_quantize.py::TestCalibration::test_wide_net_quantizes_and_tracks",
    "test_conv_pool.py::TestKernel::test_wider_channels_and_blocks",
    "test_model.py::test_output_shapes",
    "test_synth.py::TestImageEngine::test_outputs",
    "test_warp_zline.py::TestZlineWarp::test_model_env_flag_equivalence",
    "test_quantize.py::TestRegistrarQuantized::test_lazy_calibration_and_consistency",
    "test_train.py::test_smoke_train_loss_decreases",
    "test_quantize.py::TestRegistrarQuantized::test_sidecar_autoload",
    "test_quantize.py::TestCalibration::test_sidecar_roundtrip",
    "test_train.py::test_dp_step_equals_single_device_step",
    "test_train.py::test_dp_sharding_over_virtual_mesh",
    "test_quantize.py::TestRegistrarQuantized::test_lazy_calibration_persists_sidecar",
    "test_synth.py::test_preintegrated_svf_path_matches_in_engine_draw",
    "test_train.py::test_checkpoint_roundtrip",
    "test_model.py::test_shape_agnostic_weights",
    "test_ops.py::TestWarpModeEquivalence::test_gradient_equivalence",
    "test_train.py::test_grad_res2_tracks_fullres_grad",
    "test_train.py::test_zero_border_training_path",
    "test_ops.py::TestWarpBatch::test_batch_squeeze_and_gradients",
    "test_warp_onehot.py::test_gradient_matches_dense",
    "test_quantize.py::TestRegistrarQuantized::test_quant_calibrate_cli_writes_sidecar",
    "test_pipeline.py::test_run_batch_with_config_and_opt_affine",
    "test_train.py::test_svf_int_res4_compose_bridge_matches_full",
    "test_h5_keras.py::test_import_published_architecture_widths",
    "test_warp_zline.py::TestZlineWarp::test_body_matches_exactly_on_larger_flows",
    "test_ops.py::TestChunkedWarp::test_chunked_gradients_match",
    "test_train.py::test_loaded_noncontiguous_labels_are_remapped",
    "test_infer.py::TestRegisterE2E::test_pair_registration_whole_vol",
    "test_pool.py::test_grad_matches_nn_max_pool_without_ties",
    "test_ops.py::TestWarpBatch::test_compose_fields_batch_matches_unbatched",
    "test_infer.py::TestRegisterE2E::test_register_subvol",
    "test_quantize.py::TestCalibration::test_default_threshold_skips_thin_nets",
    "test_conv_pool.py::TestKernel::test_matches_reference",
    "test_conv_pool.py::TestKernel::test_negative_values_leaky",
    "test_h5_import.py::test_imported_params_apply",
    "test_h5_keras.py::test_import_real_keras_h5_svf_parity",
    "test_infer.py::TestCascadeSubvol::test_cascade_subvol_linear",
    "test_infer.py::TestCascadeSubvol::test_cascade_subvol_nearest_repreprocess",
    "test_infer.py::TestGenApplyDefField::test_cli",
    "test_infer.py::TestRegisterE2E::test_cascade_whole_vol",
    "test_infer.py::TestRegisterE2E::test_identity_params_near_identity_registration",
    "test_infer.py::TestRegisterE2E::test_register_nearest",
    "test_model.py::TestSvfSmoothing::test_model_smoothing_equals_manual",
    "test_model.py::test_identity_at_init",
    "test_onecpu.py::test_env_applied_before_backend_init",
    "test_ops.py::TestChunkedWarp::test_chunked_matches_gather8",
    "test_ops.py::TestFusedUpWarp::test_chunked_branch_matches",
    "test_ops.py::TestFusedUpWarp::test_gradient_matches_explicit",
    "test_ops.py::TestFusedUpWarp::test_model_flag_equivalence",
    "test_ops.py::TestNearestPacked::test_int8_label_payload",
    "test_ops.py::TestWarpModeEquivalence::test_value_equivalence",
    "test_parallel.py::test_cli_space_sharded_outputs_identical",
    "test_parallel.py::test_sharded_registrar_chunked_equals_one_shot",
    "test_pipeline.py::test_run_batch_jobs4_threadsafe",
    "test_pipeline.py::test_run_batch_two_step",
    "test_quantize.py::TestCalibration::test_scale_structure_and_running_max",
    "test_quantize.py::TestInt8ConvExact::test_tolerance_random_block",
    "test_quantize.py::TestRegistrarQuantized::test_quant_calibrate_cli_thin_net_errors",
    "test_resample.py::TestObliqueDeviceSpline::test_far_outside_coordinates",
    "test_resample.py::TestObliqueDeviceSpline::test_rotation_golden",
    "test_resample.py::TestObliqueSlab::test_field_channels_through_slab",
    "test_resample.py::TestObliqueSlab::test_slab_matches_scipy",
    "test_resample.py::TestSplineCval::test_oblique_cval",
    "test_synth.py::TestBlurModes::test_blur_mode_env_switch",
    "test_synth.py::TestBlurModes::test_shifts_matches_convolve",
    "test_synth.py::TestLabelMaps::test_generate_label_map",
    "test_synth.py::TestMultiScaleVelRes::test_draw_svf_small_matches_engine_keys",
    "test_synth.py::TestMultiScaleVelRes::test_engine_accepts_tuple_vel_res",
    "test_synth.py::TestPerlin::test_std_bounds",
    "test_synth.py::test_perlin_fixed_stds",
    "test_train.py::test_svf_int_res4_train_step_runs",
    "test_train.py::test_vel_res_list_train_step_runs",
    "test_warp_onehot.py::test_matches_dense_onehot_warp",
    "test_warp_onehot.py::test_soft_hard_shared_gather",
    "test_warp_zline.py::TestZlineCompose::test_compose_matches_exact",
    "test_warp_zline.py::TestZlineCompose::test_compose_rough_phi2_falls_back",
    "test_warp_zline.py::TestZlineWarp::test_batched_matches_per_element",
    "test_warp_zline.py::TestZlineWarp::test_bf16_payload_tolerance",
    "test_warp_zline.py::TestZlineWarp::test_edge_clamping",
    "test_warp_zline.py::TestZlineWarp::test_fast_path_engages_and_matches",
    "test_warp_zline.py::TestZlineWarp::test_grad_flows_through_fast_path",
    "test_warp_zline.py::TestZlineWarp::test_small_z_returns_fallback",
)


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        nodeid = item.nodeid.split("/")[-1]  # strip directory prefix
        for suffix in SLOW_TESTS:
            if nodeid == suffix or nodeid.startswith(suffix + "["):
                item.add_marker(pytest.mark.slow)
                break
