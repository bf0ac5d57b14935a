// Masked HUD compose (see include/joshupscale/compose.h).
//
// Matches the reference blend.effect math (point sampling + alpha
// blend, obs_plugin/data/effects/blend.effect): per output pixel
//   a   = 1 - mask/255                      (PSDraw: rgba.a *= 1-mean)
//   out = original*a + out*(1-a)            (SRCALPHA blend)
// computed in fixed point (x*255 rounded) so it is deterministic.

#include "joshupscale/compose.h"

#include <stdexcept>
#include <vector>

namespace JoshUpscale {
namespace core {

namespace {

inline const std::uint8_t *rowPtr(const void *base, std::ptrdiff_t stride,
                                  std::size_t y) {
  return static_cast<const std::uint8_t *>(base) +
         static_cast<std::ptrdiff_t>(y) * stride;
}

inline std::uint8_t *rowPtr(void *base, std::ptrdiff_t stride,
                            std::size_t y) {
  return static_cast<std::uint8_t *>(base) +
         static_cast<std::ptrdiff_t>(y) * stride;
}

}  // namespace

void maskedCompose(const Image &output, const Image &original,
                   const Mask &mask) {
  if (output.ptr == nullptr || original.ptr == nullptr ||
      mask.ptr == nullptr || output.width == 0 || output.height == 0 ||
      original.width == 0 || original.height == 0 || mask.width == 0 ||
      mask.height == 0) {
    throw std::runtime_error("maskedCompose: empty image/mask view");
  }
  if (output.location != DataLocation::CPU ||
      original.location != DataLocation::CPU) {
    throw std::runtime_error("maskedCompose: frames must be CPU");
  }
  const std::size_t outW = output.width;
  const std::size_t outH = output.height;

  // Precompute nearest-sample column maps (point sampling of a sprite
  // drawn over the full output quad: texel = floor(x * srcW / outW)).
  std::vector<std::size_t> origCol(outW);
  std::vector<std::size_t> maskCol(outW);
  for (std::size_t x = 0; x < outW; ++x) {
    origCol[x] = x * original.width / outW;
    maskCol[x] = x * mask.width / outW;
  }

  for (std::size_t y = 0; y < outH; ++y) {
    std::uint8_t *out = rowPtr(output.ptr, output.stride, y);
    const std::uint8_t *orig = rowPtr(
        original.ptr, original.stride, y * original.height / outH);
    const std::uint8_t *m =
        mask.ptr + static_cast<std::ptrdiff_t>(y * mask.height / outH) *
                       mask.stride;
    for (std::size_t x = 0; x < outW; ++x) {
      const unsigned keep = m[maskCol[x]];  // 255 = keep upscale
      if (keep == 255) {
        continue;
      }
      const unsigned blend = 255U - keep;  // original weight
      const std::uint8_t *op = orig + origCol[x] * 3;
      std::uint8_t *dst = out + x * 3;
      for (int c = 0; c < 3; ++c) {
        // Exact round-half-up of s/255 via (s+128 + (s+128)>>8) >> 8
        // (verified exhaustively over s in [0, 255*255]; the +127
        // variant is one LSB low whenever s % 255 == 128).
        const unsigned v = op[c] * blend + dst[c] * keep + 128U;
        dst[c] = static_cast<std::uint8_t>((v + (v >> 8)) >> 8);
      }
    }
  }
}

}  // namespace core
}  // namespace JoshUpscale
