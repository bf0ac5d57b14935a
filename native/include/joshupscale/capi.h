// Flat C ABI over the C++ runtime, for plugin shims (OBS/AviSynth-style
// hosts) and FFI consumers.  Mirrors the capability surface of the
// reference public API (core/public/JoshUpscale/core.h) minus GPU
// texture interop (no shared-texture path to a TPU).

#ifndef JOSHUPSCALE_CAPI_H_
#define JOSHUPSCALE_CAPI_H_

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct JoshUpscaleRuntime JoshUpscaleRuntime;

// Create / destroy. Returns NULL on failure (see
// joshupscale_last_error()).
JoshUpscaleRuntime *joshupscale_create_runtime(int device_id,
                                               const char *model_path);
void joshupscale_destroy_runtime(JoshUpscaleRuntime *runtime);

// Frame geometry.
size_t joshupscale_input_width(const JoshUpscaleRuntime *runtime);
size_t joshupscale_input_height(const JoshUpscaleRuntime *runtime);
size_t joshupscale_output_width(const JoshUpscaleRuntime *runtime);
size_t joshupscale_output_height(const JoshUpscaleRuntime *runtime);

// Process one BGR24 frame. Strides are in bytes and may be negative
// (bottom-up frames). Returns 0 on success, -1 on error.
int joshupscale_process(JoshUpscaleRuntime *runtime, const uint8_t *in,
                        ptrdiff_t in_stride, uint8_t *out,
                        ptrdiff_t out_stride);

// Zero the recurrent state. Returns 0 on success.
int joshupscale_reset(JoshUpscaleRuntime *runtime);

// Last error message for this thread ("" if none).
const char *joshupscale_last_error(void);

#ifdef __cplusplus
}  // extern "C"
#endif

#endif  // JOSHUPSCALE_CAPI_H_
