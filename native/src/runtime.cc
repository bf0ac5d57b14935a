// Runtime facade: frame validation, strided/bottom-up frame staging,
// backend selection, and createRuntime (reference core/src/core.cc:154-203).

#include <cstdlib>
#include <cstring>
#include <fstream>
#include <memory>
#include <stdexcept>
#include <string>
#include <vector>

#include "backend.h"
#include "joshupscale/core.h"
#include "logging.h"
#include "python_backend.h"
#ifdef JOSHUPSCALE_HAS_PJRT
#include "pjrt_backend.h"
#endif

namespace JoshUpscale {
namespace core {

namespace {

// Copy a possibly strided / bottom-up (negative stride) BGR24 frame to
// a contiguous buffer (host-side analog of the reference's
// cudaMemcpy2DAsync path, cuda_convert.cc.cu:380-436).
void copyToContiguous(const Image &img, std::vector<std::uint8_t> *dst) {
  std::size_t rowBytes = img.width * 3;
  dst->resize(rowBytes * img.height);
  const auto *src = static_cast<const std::uint8_t *>(img.ptr);
  for (std::size_t y = 0; y < img.height; ++y) {
    std::memcpy(dst->data() + y * rowBytes,
                src + static_cast<std::ptrdiff_t>(y) * img.stride,
                rowBytes);
  }
}

void copyFromContiguous(const std::vector<std::uint8_t> &src,
                        const Image &img) {
  std::size_t rowBytes = img.width * 3;
  if (src.size() != rowBytes * img.height) {
    throw std::runtime_error("Output size mismatch");
  }
  auto *dst = static_cast<std::uint8_t *>(img.ptr);
  for (std::size_t y = 0; y < img.height; ++y) {
    std::memcpy(dst + static_cast<std::ptrdiff_t>(y) * img.stride,
                src.data() + y * rowBytes, rowBytes);
  }
}

// Backend choice: the PJRT path (no embedded interpreter) is selected
// by setting JOSHUPSCALE_PJRT_PLUGIN=<plugin.so> when the package ships
// the Python-free serving artifact (step.mlir); everything else serves
// through the embedded-CPython engine, which handles any package.
std::unique_ptr<Backend> createBackend(int deviceId,
                                       const char *modelPath) {
#ifdef JOSHUPSCALE_HAS_PJRT
  const char *plugin = std::getenv("JOSHUPSCALE_PJRT_PLUGIN");
  if (plugin != nullptr && plugin[0] != '\0') {
    std::string mlir = std::string(modelPath) + "/step.mlir";
    if (!std::ifstream(mlir).good()) {
      throw std::runtime_error(
          "JOSHUPSCALE_PJRT_PLUGIN is set but the package has no "
          "step.mlir (re-export with export_stablehlo=True): " + mlir);
    }
    const char *options = std::getenv("JOSHUPSCALE_PJRT_OPTIONS");
    return std::make_unique<PjrtEngine>(
        plugin, modelPath, deviceId,
        options != nullptr ? std::string(options) : std::string());
  }
#else
  // Never fall back silently: a user asking for the Python-free path
  // must not get the embedded interpreter without an error.
  if (const char *plugin = std::getenv("JOSHUPSCALE_PJRT_PLUGIN");
      plugin != nullptr && plugin[0] != '\0') {
    throw std::runtime_error(
        "JOSHUPSCALE_PJRT_PLUGIN is set but this build has no PJRT "
        "backend (xla/pjrt/c/pjrt_c_api.h was not found at configure "
        "time)");
  }
#endif
  return std::make_unique<PythonEngine>(deviceId, modelPath);
}

class TpuRuntime final : public Runtime {
 public:
  TpuRuntime(int deviceId, const char *modelPath)
      : m_engine(createBackend(deviceId, modelPath)) {}

  void processImage(const Image &in, const Image &out) override {
    validate(in, m_engine->inputWidth(), m_engine->inputHeight(), "input");
    validate(out, m_engine->outputWidth(), m_engine->outputHeight(),
             "output");
    copyToContiguous(in, &m_inBuffer);
    m_engine->process(m_inBuffer.data(), m_inBuffer.size(), &m_outBuffer);
    copyFromContiguous(m_outBuffer, out);
  }

  bool processImageAsync(const Image &in, const Image &out) override {
    validate(in, m_engine->inputWidth(), m_engine->inputHeight(), "input");
    validate(out, m_engine->outputWidth(), m_engine->outputHeight(),
             "output");
    copyToContiguous(in, &m_inBuffer);
    if (!m_engine->processAsync(m_inBuffer.data(), m_inBuffer.size(),
                                &m_outBuffer)) {
      return false;
    }
    copyFromContiguous(m_outBuffer, out);
    return true;
  }

  bool flushImage(const Image &out) override {
    validate(out, m_engine->outputWidth(), m_engine->outputHeight(),
             "output");
    if (!m_engine->flush(&m_outBuffer)) {
      return false;
    }
    copyFromContiguous(m_outBuffer, out);
    return true;
  }

  void reset() override { m_engine->reset(); }

  std::size_t getInputWidth() const noexcept override {
    return m_engine->inputWidth();
  }
  std::size_t getInputHeight() const noexcept override {
    return m_engine->inputHeight();
  }
  std::size_t getOutputWidth() const noexcept override {
    return m_engine->outputWidth();
  }
  std::size_t getOutputHeight() const noexcept override {
    return m_engine->outputHeight();
  }

 private:
  static void validate(const Image &img, std::size_t width,
                       std::size_t height, const char *what) {
    if (img.location != DataLocation::CPU) {
      throw std::runtime_error(
          std::string("Only CPU frames are supported for ") + what);
    }
    if (img.ptr == nullptr) {
      throw std::runtime_error(std::string("Null ") + what + " frame");
    }
    if (img.width != width || img.height != height) {
      throw std::runtime_error(
          std::string("Invalid ") + what + " dimensions: got " +
          std::to_string(img.width) + 'x' + std::to_string(img.height) +
          ", expected " + std::to_string(width) + 'x' +
          std::to_string(height));
    }
  }

  std::unique_ptr<Backend> m_engine;
  std::vector<std::uint8_t> m_inBuffer;
  std::vector<std::uint8_t> m_outBuffer;
};

}  // namespace

Runtime *createRuntime(int deviceId, const char *modelPath) {
  JOSHUPSCALE_LOG_INFO << "createRuntime(device=" << deviceId
                       << ", model=" << modelPath << ')';
  return new TpuRuntime(deviceId, modelPath);
}

}  // namespace core
}  // namespace JoshUpscale
