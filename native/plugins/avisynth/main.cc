// AviSynth+ plugin shim over the TPU runtime.
//
// Behavioural parity with the reference AviSynth plugin
// (avisynth_plugin/src/main.cc): a GenericVideoFilter exposing
// JoshUpscale(clip, model_path, device) that enforces the model's
// sequential recurrence against AviSynth's random-access GetFrame --
// monotone serving, bounded backtrack replay, stream reset + warm-up on
// larger jumps, and a small cache of recent output frames.  The
// seek/cache state machine lives in the core (core::VideoStream,
// src/stream.cc, unit-tested through the C ABI); this shim adapts frame
// I/O.
//
// TPU adaptations vs the reference: frames are handed over as CPU
// memory (DataLocation::CPU only -- no CUDA device frames), and the
// runtime consumes BGR24, so the RGB32 (BGRA, bottom-up) AviSynth
// frames are repacked at the shim boundary.
//
// Build: requires the AviSynth+ SDK (avisynth.h); the CMake target is
// only added when JOSHUPSCALE_AVISYNTH_INCLUDE_DIR is found.

#if defined(__has_include)
#if __has_include(<avisynth.h>)
#define JOSHUPSCALE_HAVE_AVISYNTH 1
#endif
#endif

#ifdef JOSHUPSCALE_HAVE_AVISYNTH

#include <avisynth.h>

#include <cstddef>
#include <cstdint>
#include <cstring>
#include <memory>
#include <vector>

#include "joshupscale/core.h"
#include "../../src/stream.h"

#ifndef AVS_EXPORT
#ifdef _WIN32
#define AVS_EXPORT __declspec(dllexport)
#define AVS_CALL __stdcall
#else
#define AVS_EXPORT __attribute__((visibility("default")))
#define AVS_CALL
#endif
#endif

namespace JoshUpscale {
namespace avisynth {

namespace {

constexpr int kMaxBacktrack = 16;

class JoshUpscaleFilter : public GenericVideoFilter {
 public:
  JoshUpscaleFilter(PClip child, IScriptEnvironment *env,
                    const char *modelPath, int device)
      : GenericVideoFilter(child) {
    if (!vi.IsRGB32()) {
      env->ThrowError("JoshUpscale: only RGB32 format is supported");
    }
    try {
      m_runtime.reset(core::createRuntime(device, modelPath));
    } catch (...) {
      auto exception = core::getExceptionString();
      env->ThrowError("JoshUpscale: %s", exception.c_str());
    }
    m_inW = m_runtime->getInputWidth();
    m_inH = m_runtime->getInputHeight();
    if (vi.width != static_cast<int>(m_inW) ||
        vi.height != static_cast<int>(m_inH)) {
      env->ThrowError("JoshUpscale: unsupported video size");
    }
    env->CheckVersion(8);
    vi.width = static_cast<int>(m_runtime->getOutputWidth());
    vi.height = static_cast<int>(m_runtime->getOutputHeight());
  }

  PVideoFrame AVS_CALL GetFrame(int n, IScriptEnvironment *env) override {
    m_env = env;  // source callback runs inside getFrame below
    try {
      // core::VideoStream enforces the sequential recurrence (cache
      // hit on small back-seeks, replay on forward jumps, reset +
      // warm-up past the backtrack window) -- reference
      // main.cc:83-158 semantics.
      if (m_stream == nullptr) {
        m_stream = std::make_unique<core::VideoStream>(
            m_runtime.get(),
            [this](int index, std::vector<std::uint8_t> *buffer) {
              readSourceFrame(index, buffer);
            },
            kMaxBacktrack);
      }
      const std::vector<std::uint8_t> &out = m_stream->getFrame(n);
      PVideoFrame dst = m_env->NewVideoFrame(vi);
      // RGB32 frames are bottom-up: write rows in reverse.
      std::uint8_t *dstPtr = dst->GetWritePtr();
      const int pitch = dst->GetPitch();
      const std::size_t outW = static_cast<std::size_t>(vi.width);
      const std::size_t outH = static_cast<std::size_t>(vi.height);
      for (std::size_t y = 0; y < outH; ++y) {
        const std::uint8_t *srcRow = out.data() + y * outW * 3;
        std::uint8_t *dstRow =
            dstPtr + static_cast<std::ptrdiff_t>(outH - 1 - y) * pitch;
        for (std::size_t x = 0; x < outW; ++x) {
          dstRow[x * 4 + 0] = srcRow[x * 3 + 0];
          dstRow[x * 4 + 1] = srcRow[x * 3 + 1];
          dstRow[x * 4 + 2] = srcRow[x * 3 + 2];
          dstRow[x * 4 + 3] = 0xFF;
        }
      }
      return dst;
    } catch (...) {
      auto exception = core::getExceptionString();
      env->ThrowError("JoshUpscale: %s", exception.c_str());
      return nullptr;  // unreachable; ThrowError longjmps
    }
  }

  int AVS_CALL SetCacheHints(int cacheHints,
                             [[maybe_unused]] int frameRange) override {
    switch (cacheHints) {
      case CACHE_GET_DEV_TYPE:
      case CACHE_GET_CHILD_DEV_TYPE:
        return DEV_TYPE_CPU;  // TPU backend consumes host frames only
      case CACHE_GET_MTMODE:
        return MT_SERIALIZED;  // recurrent state: no parallel GetFrame
      default:
        return 0;
    }
  }

 private:
  // Pull the child frame (the stream mirrors pre-stream warm-up
  // indices itself, so index >= 0 here; reference main.cc:110) and
  // repack bottom-up RGB32 -> contiguous BGR24.
  void readSourceFrame(int index, std::vector<std::uint8_t> *buffer) {
    PVideoFrame src = child->GetFrame(index, m_env);
    buffer->resize(m_inW * m_inH * 3);
    const std::uint8_t *srcPtr = src->GetReadPtr();
    const int pitch = src->GetPitch();
    for (std::size_t y = 0; y < m_inH; ++y) {
      const std::uint8_t *srcRow =
          srcPtr + static_cast<std::ptrdiff_t>(m_inH - 1 - y) * pitch;
      std::uint8_t *dstRow = buffer->data() + y * m_inW * 3;
      for (std::size_t x = 0; x < m_inW; ++x) {
        dstRow[x * 3 + 0] = srcRow[x * 4 + 0];
        dstRow[x * 3 + 1] = srcRow[x * 4 + 1];
        dstRow[x * 3 + 2] = srcRow[x * 4 + 2];
      }
    }
  }

  std::unique_ptr<core::Runtime> m_runtime;
  std::unique_ptr<core::VideoStream> m_stream;
  IScriptEnvironment *m_env = nullptr;
  std::size_t m_inW = 0;
  std::size_t m_inH = 0;
};

AVSValue AVS_CALL CreateFilter(AVSValue args, [[maybe_unused]] void *userData,
                               IScriptEnvironment *env) {
  PClip clip = args[0].AsClip();
  if (!args[1].Defined()) {
    env->ThrowError("JoshUpscale: model_path is required");
  }
  const char *model = args[1].AsString();
  int device = args[2].Defined() ? args[2].AsInt() : 0;
  return new JoshUpscaleFilter(clip, env, model, device);
}

}  // namespace

}  // namespace avisynth
}  // namespace JoshUpscale

const AVS_Linkage *AVS_linkage = nullptr;

extern "C" AVS_EXPORT const char *AVS_CALL AvisynthPluginInit3(
    IScriptEnvironment *env, const AVS_Linkage *const vectors) {
  AVS_linkage = vectors;
  env->AddFunction("JoshUpscale", "c[model_path]s[device]i",
                   &JoshUpscale::avisynth::CreateFilter, nullptr);
  return "JoshUpscale TPU plugin";
}

#endif  // JOSHUPSCALE_HAVE_AVISYNTH
