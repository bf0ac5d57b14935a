/* Real-time filter shim example over the C ABI.
 *
 * This is the shape of an OBS-style video-filter integration (the
 * reference's obs_plugin: per-frame render callback, 30 fps throttle,
 * graceful passthrough on failure -- filter.cc:182-226, 380-389).
 * libobs is not part of this build environment, so this example drives
 * the same integration surface from a synthetic frame loop; the
 * callback structure maps 1:1 onto obs_source_info's video_render /
 * video_tick.
 *
 * Build (after building the runtime):
 *   cc -I native/include examples/realtime_filter.c \
 *      -L native/build -ljoshupscale -o realtime_filter
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "joshupscale/capi.h"

typedef struct {
  JoshUpscaleRuntime *runtime;
  uint8_t *input;   /* BGR24 LR frame buffer */
  uint8_t *output;  /* BGR24 HR frame buffer */
  double accum_seconds;
  int limit_30fps;  /* reference "Limit to 30 FPS" option */
  int frame_processed;
} Filter;

/* video_tick analog: accumulate time; allow one process per 1/30 s. */
static void filter_tick(Filter *f, double seconds) {
  f->accum_seconds += seconds;
  if (!f->limit_30fps || f->accum_seconds >= 0.03) {
    f->accum_seconds = 0.0;
    f->frame_processed = 0;
  }
}

/* video_render analog: process at most once per tick window; on any
 * failure fall back to passthrough (reference filter.cc:380-389). */
static const uint8_t *filter_render(Filter *f, const uint8_t *frame) {
  if (f->frame_processed) {
    return f->output; /* reuse last upscale within the fps window */
  }
  size_t w = joshupscale_input_width(f->runtime);
  memcpy(f->input, frame, w * joshupscale_input_height(f->runtime) * 3);
  if (joshupscale_process(
          f->runtime, f->input, (ptrdiff_t)(w * 3), f->output,
          (ptrdiff_t)(joshupscale_output_width(f->runtime) * 3)) != 0) {
    fprintf(stderr, "process failed: %s\n", joshupscale_last_error());
    return frame; /* skip-filter passthrough */
  }
  f->frame_processed = 1;
  return f->output;
}

int main(int argc, char **argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s <model_package> [frames]\n", argv[0]);
    return 2;
  }
  Filter f = {0};
  f.limit_30fps = 1;
  f.runtime = joshupscale_create_runtime(0, argv[1]);
  if (f.runtime == NULL) {
    fprintf(stderr, "createRuntime failed: %s\n",
            joshupscale_last_error());
    return 1;
  }
  size_t in_size = joshupscale_input_width(f.runtime) *
                   joshupscale_input_height(f.runtime) * 3;
  size_t out_size = joshupscale_output_width(f.runtime) *
                    joshupscale_output_height(f.runtime) * 3;
  f.input = malloc(in_size);
  f.output = malloc(out_size);
  uint8_t *frame = malloc(in_size);
  memset(frame, 128, in_size);

  long frames = argc > 2 ? atol(argv[2]) : 60;
  for (long i = 0; i < frames; ++i) {
    filter_tick(&f, 1.0 / 60.0); /* 60 Hz compositor, 30 fps processing */
    const uint8_t *out = filter_render(&f, frame);
    (void)out;
  }
  printf("rendered %ld ticks\n", frames);
  joshupscale_destroy_runtime(f.runtime);
  free(f.input);
  free(f.output);
  free(frame);
  return 0;
}
