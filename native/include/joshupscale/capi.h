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

// Pipelined processing (1-deep in-flight queue; one frame of added
// latency): submits `in` and fills `out` with the PREVIOUS submission's
// result when ready.  Returns 1 when `out` was filled, 0 when the
// pipeline is still filling, -1 on error.  Do not mix with
// joshupscale_process on the same runtime; drain with
// joshupscale_flush.
int joshupscale_process_async(JoshUpscaleRuntime *runtime,
                              const uint8_t *in, ptrdiff_t in_stride,
                              uint8_t *out, ptrdiff_t out_stride);

// Drain the pipeline: 1 when `out` was filled with the last in-flight
// frame, 0 when nothing was pending, -1 on error.
int joshupscale_flush(JoshUpscaleRuntime *runtime, uint8_t *out,
                      ptrdiff_t out_stride);

// Zero the recurrent state. Returns 0 on success.
int joshupscale_reset(JoshUpscaleRuntime *runtime);

// ---------------------------------------------------------------------
// Sequential video stream (AviSynth-filter semantics): monotone frame
// serving with bounded backtrack, stream reset + warm-up replay on
// seeks, LRU output cache.  The source callback must fill `buffer`
// (contiguous BGR24, input_width*input_height*3 bytes) with frame
// `index` (always >= 0: pre-stream warm-up indices arrive mirrored).

typedef struct JoshUpscaleStream JoshUpscaleStream;
typedef void (*JoshUpscaleFrameSource)(void *user, int index,
                                       uint8_t *buffer);

// The stream borrows `runtime` (caller keeps ownership; destroy the
// stream first).  `max_backtrack <= 0` selects the default window
// (16, the reference MAX_BACKTRACK_SIZE).
JoshUpscaleStream *joshupscale_create_stream(
    JoshUpscaleRuntime *runtime, JoshUpscaleFrameSource source,
    void *user, int max_backtrack);
void joshupscale_destroy_stream(JoshUpscaleStream *stream);

// Upscaled frame n, written to `out` (contiguous BGR24,
// output_width*output_height*3 bytes). Returns 0 on success.
int joshupscale_stream_get_frame(JoshUpscaleStream *stream, int n,
                                 uint8_t *out);

// ---------------------------------------------------------------------
// Masked HUD compose (the reference OBS filter's PS2 mode,
// obs_plugin/src/filter.cc:393-402): re-composite the ORIGINAL input
// frame over the upscaled output wherever the grayscale mask is dark
// (255 = keep upscale, 0 = keep original), both point-sampled onto the
// output grid.  `out` is modified in place.  Returns 0 on success.
int joshupscale_masked_compose(
    uint8_t *out, ptrdiff_t out_stride, size_t out_width,
    size_t out_height, const uint8_t *original, ptrdiff_t orig_stride,
    size_t orig_width, size_t orig_height, const uint8_t *mask,
    ptrdiff_t mask_stride, size_t mask_width, size_t mask_height);

// Load a PNG mask asset (the reference ships obs_plugin/data/mask.png)
// into a malloc'd row-major grayscale keep-map (width*height bytes,
// 255 = keep upscale).  8-bit non-interlaced PNG, gray/RGB/palette/
// gray+alpha/RGBA.  Free with joshupscale_free.  Returns NULL on
// failure (see joshupscale_last_error()).
uint8_t *joshupscale_load_mask_png(const char *path, size_t *width,
                                   size_t *height);
void joshupscale_free(void *ptr);

// ---------------------------------------------------------------------
// Frame pacing (the reference OBS filter's "Limit to 30 FPS",
// obs_plugin/src/filter.cc:221-226).  Accumulate source seconds with
// joshupscale_pacer_tick; joshupscale_pacer_should_process reports
// whether the next render must run the model; mark_processed resets
// the accumulator after a successful process.

typedef struct JoshUpscalePacer JoshUpscalePacer;

JoshUpscalePacer *joshupscale_create_pacer(int limit_fps,
                                           float frame_budget_seconds);
void joshupscale_destroy_pacer(JoshUpscalePacer *pacer);
void joshupscale_pacer_set_limit(JoshUpscalePacer *pacer, int limit_fps);
void joshupscale_pacer_tick(JoshUpscalePacer *pacer, float seconds);
int joshupscale_pacer_should_process(const JoshUpscalePacer *pacer);
void joshupscale_pacer_mark_processed(JoshUpscalePacer *pacer);
void joshupscale_pacer_invalidate(JoshUpscalePacer *pacer);

// Last error message for this thread ("" if none).
const char *joshupscale_last_error(void);

#ifdef __cplusplus
}  // extern "C"
#endif

#endif  // JOSHUPSCALE_CAPI_H_
