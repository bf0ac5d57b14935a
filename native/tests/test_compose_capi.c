/* C ABI test: masked HUD compose + frame pacer (no model needed).
 *
 * Verifies the PS2 masked-overlay semantics (reference
 * obs_plugin/data/effects/blend.effect: out = orig*(1-m) + out*m with
 * point sampling) and the 30 FPS pacing state machine (reference
 * obs_plugin/src/filter.cc:221-226).
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

static int test_compose(void) {
  enum { IN_W = 8, IN_H = 6, OUT_W = 32, OUT_H = 24 };
  uint8_t orig[IN_H * IN_W * 3];
  uint8_t out[OUT_H * OUT_W * 3];
  uint8_t expect_up[OUT_H * OUT_W * 3];
  uint8_t mask[OUT_H * OUT_W];

  for (int i = 0; i < IN_H * IN_W * 3; ++i) {
    orig[i] = (uint8_t)((i * 37 + 11) & 0xFF);
  }
  for (int i = 0; i < OUT_H * OUT_W * 3; ++i) {
    out[i] = (uint8_t)((i * 53 + 5) & 0xFF);
    expect_up[i] = out[i];
  }
  /* mask: left half keep original (0), right half keep upscale (255),
   * one row at 128. */
  for (int y = 0; y < OUT_H; ++y) {
    for (int x = 0; x < OUT_W; ++x) {
      mask[y * OUT_W + x] = (uint8_t)(x < OUT_W / 2 ? 0 : 255);
    }
  }
  for (int x = 0; x < OUT_W; ++x) {
    mask[5 * OUT_W + x] = 128;
  }

  CHECK(joshupscale_masked_compose(out, OUT_W * 3, OUT_W, OUT_H, orig,
                                   IN_W * 3, IN_W, IN_H, mask, OUT_W,
                                   OUT_W, OUT_H) == 0);

  for (int y = 0; y < OUT_H; ++y) {
    for (int x = 0; x < OUT_W; ++x) {
      const uint8_t m = mask[y * OUT_W + x];
      /* nearest (point) sample of the original */
      const int sx = x * IN_W / OUT_W;
      const int sy = y * IN_H / OUT_H;
      for (int c = 0; c < 3; ++c) {
        const uint8_t o = orig[(sy * IN_W + sx) * 3 + c];
        const uint8_t u = expect_up[(y * OUT_W + x) * 3 + c];
        const uint8_t got = out[(y * OUT_W + x) * 3 + c];
        if (m == 255) {
          CHECK(got == u); /* keep upscale */
        } else if (m == 0) {
          CHECK(got == o); /* keep original */
        } else {
          /* rounded blend o*(1-m/255) + u*(m/255) */
          const unsigned v = o * (255u - m) + u * m;
          /* true round-half-up, NOT the implementation's formula */
          const uint8_t want = (uint8_t)((v + 127u) / 255u);
          CHECK(got == want);
        }
      }
    }
  }

  /* bottom-up (negative stride) output view must compose identically */
  uint8_t out2[OUT_H * OUT_W * 3];
  for (int i = 0; i < OUT_H * OUT_W * 3; ++i) {
    out2[i] = expect_up[i];
  }
  /* flip: present rows bottom-up */
  uint8_t flipped[OUT_H * OUT_W * 3];
  for (int y = 0; y < OUT_H; ++y) {
    memcpy(flipped + y * OUT_W * 3,
           out2 + (OUT_H - 1 - y) * OUT_W * 3, OUT_W * 3);
  }
  CHECK(joshupscale_masked_compose(
            flipped + (OUT_H - 1) * OUT_W * 3, -(ptrdiff_t)(OUT_W * 3),
            OUT_W, OUT_H, orig, IN_W * 3, IN_W, IN_H, mask, OUT_W,
            OUT_W, OUT_H) == 0);
  for (int y = 0; y < OUT_H; ++y) {
    CHECK(memcmp(flipped + (OUT_H - 1 - y) * OUT_W * 3,
                 out + y * OUT_W * 3, OUT_W * 3) == 0);
  }

  /* error path: empty view */
  CHECK(joshupscale_masked_compose(NULL, 0, 0, 0, orig, IN_W * 3, IN_W,
                                   IN_H, mask, OUT_W, OUT_W,
                                   OUT_H) == -1);
  CHECK(strlen(joshupscale_last_error()) > 0);
  return 0;
}

static int test_pacer(void) {
  JoshUpscalePacer *p = joshupscale_create_pacer(1, 0.03f);
  CHECK(p != NULL);
  /* first frame always processes */
  CHECK(joshupscale_pacer_should_process(p) == 1);
  joshupscale_pacer_mark_processed(p);
  CHECK(joshupscale_pacer_should_process(p) == 0);
  /* 60 fps ticks: every other tick crosses the 0.03 s budget */
  joshupscale_pacer_tick(p, 1.0f / 60.0f);
  CHECK(joshupscale_pacer_should_process(p) == 0);
  joshupscale_pacer_tick(p, 1.0f / 60.0f);
  CHECK(joshupscale_pacer_should_process(p) == 1);
  joshupscale_pacer_mark_processed(p);
  /* limit off: every tick processes */
  joshupscale_pacer_set_limit(p, 0);
  joshupscale_pacer_tick(p, 0.001f);
  CHECK(joshupscale_pacer_should_process(p) == 1);
  joshupscale_pacer_mark_processed(p);
  /* invalidate forces reprocess (model switch) */
  joshupscale_pacer_set_limit(p, 1);
  joshupscale_pacer_invalidate(p);
  CHECK(joshupscale_pacer_should_process(p) == 1);
  joshupscale_destroy_pacer(p);
  return 0;
}

int main(void) {
  if (test_compose() != 0) return 1;
  if (test_pacer() != 0) return 1;
  printf("compose+pacer C API OK\n");
  return 0;
}
