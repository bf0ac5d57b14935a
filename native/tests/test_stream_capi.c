/* Drive the C stream API: seek-back must serve cached frames. */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "joshupscale/capi.h"

static int g_calls = 0;
static size_t g_in_size = 0;
static void source(void *user, int index, uint8_t *buffer) {
  (void)user;
  g_calls++;
  memset(buffer, 30 + index * 7, g_in_size);
}

int main(int argc, char **argv) {
  JoshUpscaleRuntime *rt = joshupscale_create_runtime(0, argv[1]);
  if (!rt) { fprintf(stderr, "%s\n", joshupscale_last_error()); return 1; }
  g_in_size = joshupscale_input_width(rt) * joshupscale_input_height(rt) * 3;
  JoshUpscaleStream *st = joshupscale_create_stream(rt, source, NULL, 4);
  size_t out_size = joshupscale_output_width(rt) *
                    joshupscale_output_height(rt) * 3;
  uint8_t *a = malloc(out_size), *b = malloc(out_size);
  for (int n = 0; n < 3; ++n)
    if (joshupscale_stream_get_frame(st, n, a) != 0) return 2;
  memcpy(b, a, out_size);               /* frame 2 */
  int calls_before = g_calls;
  if (joshupscale_stream_get_frame(st, 2, a) != 0) return 2; /* cached */
  if (g_calls != calls_before) { fprintf(stderr, "cache miss!\n"); return 3; }
  if (memcmp(a, b, out_size) != 0) { fprintf(stderr, "mismatch!\n"); return 4; }
  if (joshupscale_stream_get_frame(st, 9, a) != 0) return 2; /* jump */
  printf("stream C API OK (source calls: %d)\n", g_calls);
  joshupscale_destroy_stream(st);
  joshupscale_destroy_runtime(rt);
  return 0;
}
