/* C ABI test: the SHIPPED PS2 HUD mask asset drives maskedCompose.
 *
 * Loads native/plugins/obs/data/mask.png (the analog of the
 * reference's obs_plugin/data/mask.png) through the real PNG decode
 * path and verifies the compose semantics from the real file: bright
 * mask regions keep the upscaled output, dark regions re-composite the
 * original frame.
 *
 * Usage: test_mask_asset_capi <path/to/mask.png>
 */

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "joshupscale/capi.h"

#define CHECK(cond)                                               \
  do {                                                            \
    if (!(cond)) {                                                \
      fprintf(stderr, "CHECK failed at %s:%d: %s\n", __FILE__,    \
              __LINE__, #cond);                                   \
      return 1;                                                   \
    }                                                             \
  } while (0)

int main(int argc, char **argv) {
  if (argc != 2) {
    fprintf(stderr, "usage: %s mask.png\n", argv[0]);
    return 2;
  }
  size_t w = 0;
  size_t h = 0;
  uint8_t *mask = joshupscale_load_mask_png(argv[1], &w, &h);
  CHECK(mask != NULL);
  CHECK(w == 1920 && h == 1080);

  /* Binary mask with both regions present (placeholder HUD geometry
   * from tools/make_hud_mask.py). */
  size_t keep = 0;
  size_t hud = 0;
  for (size_t i = 0; i < w * h; ++i) {
    CHECK(mask[i] == 0 || mask[i] == 255);
    if (mask[i] == 255) {
      ++keep;
    } else {
      ++hud;
    }
  }
  CHECK(keep > 0 && hud > 0);
  CHECK(mask[950 * w + 100] == 0);    /* status bar */
  CHECK(mask[150 * w + 1700] == 0);   /* minimap corner */
  CHECK(mask[10 * w + 10] == 255);    /* open play area */

  /* Compose a synthetic frame pair under the shipped mask. */
  enum { IN_W = 480, IN_H = 270 };
  uint8_t *orig = malloc((size_t)IN_W * IN_H * 3);
  uint8_t *out = malloc(w * h * 3);
  CHECK(orig != NULL && out != NULL);
  memset(orig, 10, (size_t)IN_W * IN_H * 3);
  memset(out, 200, w * h * 3);
  CHECK(joshupscale_masked_compose(
            out, (ptrdiff_t)(w * 3), w, h, orig, IN_W * 3, IN_W, IN_H,
            mask, (ptrdiff_t)w, w, h) == 0);
  /* HUD region shows the original; play area keeps the upscale. */
  CHECK(out[(950 * w + 100) * 3] == 10);
  CHECK(out[(10 * w + 10) * 3] == 200);

  free(orig);
  free(out);
  joshupscale_free(mask);
  printf("mask asset C API OK\n");
  return 0;
}
