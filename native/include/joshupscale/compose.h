// Masked HUD re-overlay: the PS2-mode compose the reference OBS filter
// does on GPU (obs_plugin/src/filter.cc:393-402 + the blend.effect
// pixel shader): the ORIGINAL (pre-upscale) frame is drawn over the
// upscaled output with per-pixel alpha = 1 - mask/255, both the frame
// and the mask point-sampled (nearest) onto the output grid.  Bright
// mask regions keep the upscale; dark regions re-composite the
// original content (HUD elements that should not be hallucinated).
//
// TPU-native placement: there is no shared-texture path, so the
// compose runs as a host post-step on the CPU frames the shims already
// hold (it is a few ms of memory-bound byte math at 1080p, overlapped
// with the next frame's device dispatch).

#ifndef JOSHUPSCALE_COMPOSE_H_
#define JOSHUPSCALE_COMPOSE_H_

#include <cstddef>
#include <cstdint>

#include "joshupscale/core.h"

namespace JoshUpscale {
namespace core {

// Grayscale mask view; 255 = show upscaled output, 0 = keep original.
// `stride` in bytes, may be negative (bottom-up).
struct Mask {
  const std::uint8_t *ptr = nullptr;
  std::ptrdiff_t stride = 0;
  std::size_t width = 0;
  std::size_t height = 0;
};

// Composite `original` (the LR input frame) over `output` (the HR
// upscaled frame, modified in place) under `mask`:
//   out = original_nearest * (1 - m/255) + out * (m/255)
// Throws std::runtime_error on empty views.
void maskedCompose(const Image &output, const Image &original,
                   const Mask &mask);

}  // namespace core
}  // namespace JoshUpscale

#endif  // JOSHUPSCALE_COMPOSE_H_
