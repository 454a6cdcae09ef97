"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding/collective tests exercise pjit/shard_map without TPU hardware
(SURVEY.md §4 item 4)."""

import os

# force CPU: the ambient environment presets JAX_PLATFORMS=axon (TPU);
# unit tests run on a virtual 8-device CPU mesh instead
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("EVFLOW_SCATTER_IMPL", "xla")

import jax  # noqa: E402

# the axon sitecustomize force-selects the TPU backend via jax.config, which
# overrides the env var — override it back after import
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import sys  # noqa: E402

import pytest  # noqa: E402


# Two-tier suite (SURVEY §4 + round-3 verdict weak #6): everything in
# SLOW_TESTS gets the `slow` marker (registered in pyproject.toml), so
#   pytest -m "not slow"   -> fast signal, < 3 min on CPU
#   pytest                 -> the full ~30 min suite
# Centralized here (node-id substrings, measured with --durations) instead
# of scattering decorators; subprocess/e2e files also self-mark.
SLOW_TESTS = (
    "test_multiprocess.py::test_two_process_dp",
    "test_multiprocess.py::test_two_process_2d_mesh",
    "test_eval_cli.py::test_sharded_cli",
    "test_train_cli.py",
    "test_eval_protocol_parity.py",
    "test_ref_cli_subprocess.py",
    "test_fused_lif.py::test_train_step_under_fused_bf16_cells",
    "test_fused_lif.py::test_liffirenet_fused_matches_xla_impl",
    "test_train_step.py::test_remat_policies_numerically_identical",
    "test_train_step.py::test_padded_window_step_matches_short_step",
    "test_train_step.py::test_data_parallel_sharded_step",
    "test_train_step.py::test_micro_batch_grad_accumulation_identical",
    "test_train_step.py::test_reset_zeroes_model_state",
    "test_train_step.py::test_train_step_runs_and_loss_finite",
    "test_train_step.py::test_augmentation_flags_change_loss",
    "test_train_step.py::test_training_reduces_loss",
    "test_train_step.py::test_time_mode_event_count_gated_cadence",
    "test_train_step.py::test_training_vis_artifacts",
    "test_determinism_and_resume.py::test_multiscale_unet_training_step",
    "test_determinism_and_resume.py::test_exact_resume",
    "test_parallel.py::test_2d_mesh_event_sharding_matches_single_device",
    "test_parallel.py::test_shard_map_loss_matches_plain_loss",
    "test_parallel.py::test_3d_mesh_tensor_parallel_matches_single_device",
    "test_parallel.py::test_8way_dp_matches_smaller_mesh",
    "test_parallel.py::test_3d_mesh_tp_unet_deep_channels_matches_single_device",
    "test_parallel.py::test_sharded_checkpoint_save_restore_continue",
    "test_loss.py::test_loss_differentiable_and_nonzero_grad",
    "test_iwe_matmul.py::test_loss_impls_agree",
    "test_conv_dtype.py::test_unet_trace_under_fast_conv_config",
    "test_conv_dtype.py::test_training_still_optimizes_bf16",
    "test_conv_dtype.py::test_cell_bf16_lif_tracks_f32_training",
    "test_conv_dtype.py::test_cell_bf16_loss_close_and_state_f32",
    "test_conv_dtype.py::test_full_model_forward_bf16_close",
    "test_conv_dtype.py::test_cell_bf16_carried_state_matches_reset",
    "test_h5_stream.py::test_time_mode_training_feed",
    "test_unet_models.py::test_odd_resolution_forward",
    "test_export_torch.py::test_export_import_round_trip",
    "test_export_torch.py::test_torch_side_forward_parity",
    "test_quant.py::test_int8_engine_tracks_f32_and_scopes_policy",
    "test_quant.py::test_int8_engine_serializes",
    "test_quant.py::test_int8_eval_metric_deltas_bounded",
    "test_eval_harness.py::test_chunked_matches_per_window",
    "test_eval_harness.py::test_mesh_eval_matches_single_device",
    "test_firenet.py::test_gradients_flow_through_bptt",
    "test_parity_reference.py::test_event_warping_loss_matches_reference",
    "test_serialized.py::test_serialized_step_many",
    "test_unet_models.py::test_unet_variant_forward[PLIFRecEVFlowNet]",
    "test_unet_models.py::test_unet_variant_forward[ALIFRecEVFlowNet]",
    "test_unet_models.py::test_unet_variant_forward[E2VID]",
    "test_unet_models.py::test_unet_variant_forward[XLIFRecEVFlowNet]",
    "test_import_torch.py::test_strict_import_all_models",
    "test_import_torch.py::test_forward_parity_through_importer",
    "test_firenet.py::test_variant_forward_and_state[ALIFFireNet]",
    "test_determinism_and_resume.py::test_loss_grad_is_deterministic",
    "test_iwe_matmul.py::test_splat_matches_scatter_values_and_flow_grads",
    "test_serialized.py::test_serialized_matches_live",
    "test_loss.py::test_smoothness_penalizes_rough_flow",
    "test_loss.py::test_loss_lower_at_true_flow",
    "test_conv_dtype.py::test_im2col_native_backward_matches_patch_autodiff",
    "test_conv_dtype.py::test_single_conv_bf16_close_to_f32",
    "test_conv_pallas.py::test_gradients_match_xla",
    "test_encodings.py::test_encode_window_shapes_and_padding",
    "test_export_torch.py::test_mlflow_layout_export",
    "test_cell_parity.py::test_conv_lif_weight_norm_init_matches_torch",
    "test_eval_harness.py::test_gt_f16_transfer_matches_f32",
    "test_eval_harness.py::test_fwl_rsat_zero_flow_is_unity",
    "test_export_serving.py::test_export_serving_cli_round_trip",
    "test_misc.py::test_inference_engine_step_many_matches_step",
    "test_iwe_matmul.py::test_gather_planes_value_and_grad",
    "test_iwe_matmul.py::test_round_idx_splat_equals_scatter_metrics_path",
    "test_conv_dtype.py::test_forced_im2col_respects_stride",
    "test_fused_lif.py::test_gradients_match_unfused",
    "test_firenet.py::test_variant_forward_and_state[FireNet]",
    "test_unet_models.py::test_unet_variant_forward[SpikingRecEVFlowNet]",
    "test_unet_models.py::test_unet_variant_forward[LeakyRecEVFlowNet]",
    "test_model_parity.py::test_rec_evflownet_multistep_parity",
    "test_firenet.py::test_variant_forward_and_state[FireFlowNet]",
    "test_unet_models.py::test_unet_variant_forward[EVFlowNet]",
    "test_loss.py::test_multi_scale_average",
    "test_eval_harness.py::test_results_keyed_per_file",
    "test_eval_harness.py::test_fwl_improves_with_true_flow",
    "test_eval_harness.py::test_window_eval_accumulation",
    "test_serialized.py::test_serialized_short_window_padding",
    "test_iwe.py::test_mass_conservation_random_inbounds",
    "test_iwe.py::test_bilinear_weights_integer_coords",
    "test_iwe.py::test_interpolation_differentiable_wrt_flow",
    "test_quant.py::test_int8_conv_error_bound",
    "test_quant.py::test_int8_binary_input_weight_only_error",
    "test_cell_parity.py::test_conv_lif_recurrent_group_norm_matches_reference",
    "test_loss.py::test_fwl_zero_flow_is_one",
)


def pytest_collection_modifyitems(config, items):
    matched = set()
    for item in items:
        for s in SLOW_TESTS:
            if s in item.nodeid:
                item.add_marker(pytest.mark.slow)
                matched.add(s)
    # staleness guard: a renamed/removed test must not silently fall out
    # of the slow tier (it would bloat the fast tier without any signal).
    # Only meaningful on full-file collection — single-file runs check
    # just their own entries, and -k filtered runs skip the check.
    if config.getoption("keyword", ""):
        return
    collected_files = {item.nodeid.split("::", 1)[0] for item in items}
    stale = [
        s for s in SLOW_TESTS
        if s not in matched
        and s.split("::", 1)[0] in {f.rsplit("/", 1)[-1] for f in collected_files}
    ]
    if stale:
        raise pytest.UsageError(
            "stale SLOW_TESTS entries (test renamed/removed? update "
            "tests/conftest.py): " + ", ".join(stale)
        )


@pytest.fixture(autouse=True)
def _reset_reference_shared_kwargs():
    """The reference FireNet family mutates a CLASS-level shared kwargs
    list (reference: model.py:159, :171-173); reset it between tests so
    models built by one test don't leak neuron kwargs into another."""
    mod = sys.modules.get("models.model")
    if mod is not None:
        for obj in list(vars(mod).values()):
            if isinstance(obj, type) and "kwargs" in vars(obj):
                obj.kwargs = [{} for _ in obj.kwargs]
    yield
