"""Interoperability with the reference PyTorch framework: checkpoint
import (``.pth`` -> flax variables) so existing users can migrate trained
models without retraining."""

from planar_optical_flow_tpu.interop.torch_ckpt import (  # noqa: F401
    import_state_dict,
    import_torch_checkpoint,
    load_reference_checkpoint,
)
