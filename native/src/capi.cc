// C ABI implementation (see capi.h).

#include "joshupscale/capi.h"

#include <cstdlib>
#include <cstring>
#include <memory>
#include <string>
#include <vector>

#include "joshupscale/compose.h"
#include "joshupscale/core.h"
#include "joshupscale/pacing.h"
#include "joshupscale/png.h"
#include "stream.h"

namespace {

thread_local std::string g_lastError;

JoshUpscale::core::Runtime *unwrap(JoshUpscaleRuntime *runtime) {
  return reinterpret_cast<JoshUpscale::core::Runtime *>(runtime);
}

const JoshUpscale::core::Runtime *unwrap(
    const JoshUpscaleRuntime *runtime) {
  return reinterpret_cast<const JoshUpscale::core::Runtime *>(runtime);
}

JoshUpscale::core::Image makeImage(const void *ptr, ptrdiff_t stride,
                                   size_t width, size_t height) {
  JoshUpscale::core::Image img;
  img.ptr = const_cast<void *>(ptr);
  img.location = JoshUpscale::core::DataLocation::CPU;
  img.stride = stride;
  img.width = width;
  img.height = height;
  return img;
}

}  // namespace

extern "C" {

JoshUpscaleRuntime *joshupscale_create_runtime(int device_id,
                                               const char *model_path) {
  try {
    return reinterpret_cast<JoshUpscaleRuntime *>(
        JoshUpscale::core::createRuntime(device_id, model_path));
  } catch (...) {
    g_lastError = JoshUpscale::core::getExceptionString();
    return nullptr;
  }
}

void joshupscale_destroy_runtime(JoshUpscaleRuntime *runtime) {
  delete unwrap(runtime);
}

size_t joshupscale_input_width(const JoshUpscaleRuntime *runtime) {
  return unwrap(runtime)->getInputWidth();
}
size_t joshupscale_input_height(const JoshUpscaleRuntime *runtime) {
  return unwrap(runtime)->getInputHeight();
}
size_t joshupscale_output_width(const JoshUpscaleRuntime *runtime) {
  return unwrap(runtime)->getOutputWidth();
}
size_t joshupscale_output_height(const JoshUpscaleRuntime *runtime) {
  return unwrap(runtime)->getOutputHeight();
}

int joshupscale_process(JoshUpscaleRuntime *runtime, const uint8_t *in,
                        ptrdiff_t in_stride, uint8_t *out,
                        ptrdiff_t out_stride) {
  try {
    auto *rt = unwrap(runtime);
    auto inImg = makeImage(in, in_stride, rt->getInputWidth(),
                           rt->getInputHeight());
    auto outImg = makeImage(out, out_stride, rt->getOutputWidth(),
                            rt->getOutputHeight());
    rt->processImage(inImg, outImg);
    return 0;
  } catch (...) {
    g_lastError = JoshUpscale::core::getExceptionString();
    return -1;
  }
}

int joshupscale_process_async(JoshUpscaleRuntime *runtime,
                              const uint8_t *in, ptrdiff_t in_stride,
                              uint8_t *out, ptrdiff_t out_stride) {
  try {
    auto *rt = unwrap(runtime);
    auto inImg = makeImage(in, in_stride, rt->getInputWidth(),
                           rt->getInputHeight());
    auto outImg = makeImage(out, out_stride, rt->getOutputWidth(),
                            rt->getOutputHeight());
    return rt->processImageAsync(inImg, outImg) ? 1 : 0;
  } catch (...) {
    g_lastError = JoshUpscale::core::getExceptionString();
    return -1;
  }
}

int joshupscale_flush(JoshUpscaleRuntime *runtime, uint8_t *out,
                      ptrdiff_t out_stride) {
  try {
    auto *rt = unwrap(runtime);
    auto outImg = makeImage(out, out_stride, rt->getOutputWidth(),
                            rt->getOutputHeight());
    return rt->flushImage(outImg) ? 1 : 0;
  } catch (...) {
    g_lastError = JoshUpscale::core::getExceptionString();
    return -1;
  }
}

int joshupscale_reset(JoshUpscaleRuntime *runtime) {
  try {
    unwrap(runtime)->reset();
    return 0;
  } catch (...) {
    g_lastError = JoshUpscale::core::getExceptionString();
    return -1;
  }
}

JoshUpscaleStream *joshupscale_create_stream(
    JoshUpscaleRuntime *runtime, JoshUpscaleFrameSource source,
    void *user, int max_backtrack) {
  try {
    auto *rt = unwrap(runtime);
    std::size_t inSize = rt->getInputWidth() * rt->getInputHeight() * 3;
    auto *stream = new JoshUpscale::core::VideoStream(
        rt,
        [source, user, inSize](int index,
                               std::vector<std::uint8_t> *buffer) {
          buffer->resize(inSize);
          source(user, index, buffer->data());
        },
        max_backtrack > 0 ? max_backtrack
                          : JoshUpscale::core::VideoStream::kMaxBacktrack);
    return reinterpret_cast<JoshUpscaleStream *>(stream);
  } catch (...) {
    g_lastError = JoshUpscale::core::getExceptionString();
    return nullptr;
  }
}

void joshupscale_destroy_stream(JoshUpscaleStream *stream) {
  delete reinterpret_cast<JoshUpscale::core::VideoStream *>(stream);
}

int joshupscale_stream_get_frame(JoshUpscaleStream *stream, int n,
                                 uint8_t *out) {
  try {
    auto &frame =
        reinterpret_cast<JoshUpscale::core::VideoStream *>(stream)
            ->getFrame(n);
    std::memcpy(out, frame.data(), frame.size());
    return 0;
  } catch (...) {
    g_lastError = JoshUpscale::core::getExceptionString();
    return -1;
  }
}

int joshupscale_masked_compose(
    uint8_t *out, ptrdiff_t out_stride, size_t out_width,
    size_t out_height, const uint8_t *original, ptrdiff_t orig_stride,
    size_t orig_width, size_t orig_height, const uint8_t *mask,
    ptrdiff_t mask_stride, size_t mask_width, size_t mask_height) {
  try {
    auto outImg = makeImage(out, out_stride, out_width, out_height);
    auto origImg =
        makeImage(original, orig_stride, orig_width, orig_height);
    JoshUpscale::core::Mask m;
    m.ptr = mask;
    m.stride = mask_stride;
    m.width = mask_width;
    m.height = mask_height;
    JoshUpscale::core::maskedCompose(outImg, origImg, m);
    return 0;
  } catch (...) {
    g_lastError = JoshUpscale::core::getExceptionString();
    return -1;
  }
}

uint8_t *joshupscale_load_mask_png(const char *path, size_t *width,
                                   size_t *height) {
  try {
    std::size_t w = 0;
    std::size_t h = 0;
    std::vector<uint8_t> gray =
        JoshUpscale::core::loadMaskPng(path, &w, &h);
    auto *out = static_cast<uint8_t *>(std::malloc(gray.size()));
    if (out == nullptr) {
      g_lastError = "joshupscale_load_mask_png: out of memory";
      return nullptr;
    }
    std::memcpy(out, gray.data(), gray.size());
    *width = w;
    *height = h;
    return out;
  } catch (...) {
    g_lastError = JoshUpscale::core::getExceptionString();
    return nullptr;
  }
}

void joshupscale_free(void *ptr) { std::free(ptr); }

JoshUpscalePacer *joshupscale_create_pacer(int limit_fps,
                                           float frame_budget_seconds) {
  return reinterpret_cast<JoshUpscalePacer *>(
      new JoshUpscale::core::FramePacer(
          limit_fps != 0,
          frame_budget_seconds > 0 ? frame_budget_seconds : 0.03F));
}

void joshupscale_destroy_pacer(JoshUpscalePacer *pacer) {
  delete reinterpret_cast<JoshUpscale::core::FramePacer *>(pacer);
}

void joshupscale_pacer_set_limit(JoshUpscalePacer *pacer,
                                 int limit_fps) {
  reinterpret_cast<JoshUpscale::core::FramePacer *>(pacer)->setLimitFps(
      limit_fps != 0);
}

void joshupscale_pacer_tick(JoshUpscalePacer *pacer, float seconds) {
  reinterpret_cast<JoshUpscale::core::FramePacer *>(pacer)->tick(
      seconds);
}

int joshupscale_pacer_should_process(const JoshUpscalePacer *pacer) {
  return reinterpret_cast<const JoshUpscale::core::FramePacer *>(pacer)
      ->shouldProcess();
}

void joshupscale_pacer_mark_processed(JoshUpscalePacer *pacer) {
  reinterpret_cast<JoshUpscale::core::FramePacer *>(pacer)
      ->markProcessed();
}

void joshupscale_pacer_invalidate(JoshUpscalePacer *pacer) {
  reinterpret_cast<JoshUpscale::core::FramePacer *>(pacer)->invalidate();
}

const char *joshupscale_last_error(void) { return g_lastError.c_str(); }

}  // extern "C"
