// Minimal PNG reader for HUD mask assets.
//
// The reference OBS plugin ships a mask.png data asset and decodes it
// with libobs' gs_image_file (obs_plugin/src/filter.cc:393-402 uses it
// for the PS2 masked-HUD blend).  Hosts without libobs (the CLI, the
// AviSynth shim, tests) need the same asset readable, so the core
// carries this self-contained decoder: 8-bit, non-interlaced PNG,
// color types gray / RGB / palette / gray+alpha / RGBA, zlib-inflated.
// Pixels are folded to the grayscale keep-map the compose step
// consumes (mean of RGB, alpha ignored -- the same fold the OBS shim's
// buildMask applies to gs_image_file RGBA data).

#ifndef JOSHUPSCALE_PNG_H_
#define JOSHUPSCALE_PNG_H_

#include <cstddef>
#include <cstdint>
#include <vector>

namespace JoshUpscale {
namespace core {

// Decode `path` into a row-major grayscale buffer (width*height bytes,
// 255 = keep upscale).  Throws std::runtime_error on malformed or
// unsupported files.
std::vector<std::uint8_t> loadMaskPng(const char *path,
                                      std::size_t *width,
                                      std::size_t *height);

}  // namespace core
}  // namespace JoshUpscale

#endif  // JOSHUPSCALE_PNG_H_
