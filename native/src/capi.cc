// C ABI implementation (see capi.h).

#include "joshupscale/capi.h"

#include <cstring>
#include <memory>
#include <string>
#include <vector>

#include "joshupscale/core.h"
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

const char *joshupscale_last_error(void) { return g_lastError.c_str(); }

}  // extern "C"
