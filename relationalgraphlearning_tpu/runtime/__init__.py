from relationalgraphlearning_tpu.runtime.native_orca import (
    native_orca_available,
    orca_step_batch_native,
    NativeORCA,
)
