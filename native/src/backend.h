// Serving-backend interface for the native runtime.
//
// Two implementations exist:
//  - PythonEngine (python_backend.h): embedded CPython driving the jitted
//    XLA engine -- full-featured (any package, any model option).
//  - PjrtEngine (pjrt_backend.h): loads the package's weight-embedded
//    StableHLO through the PJRT C API -- no Python at all, the analog of
//    the reference's self-contained TensorRT deserialization
//    (core/src/tensorrt_backend.cc:117-278).

#ifndef JOSHUPSCALE_SRC_BACKEND_H_
#define JOSHUPSCALE_SRC_BACKEND_H_

#include <cstdint>
#include <vector>

namespace JoshUpscale {
namespace core {

class Backend {
 public:
  virtual ~Backend() = default;

  // in: H*W*3 interleaved u8 bytes; out is resized to (scale*H)*(scale*W)*3.
  virtual void process(const std::uint8_t *in, std::size_t inSize,
                       std::vector<std::uint8_t> *out) = 0;

  // Pipelined variant: submit `in`; fill `out` with the oldest
  // completed frame when one is ready (true) -- outputs in submission
  // order.  Default: synchronous passthrough (no queue).
  virtual bool processAsync(const std::uint8_t *in, std::size_t inSize,
                            std::vector<std::uint8_t> *out) {
    process(in, inSize, out);
    return true;
  }

  // Drain the pipeline (false when nothing is in flight).
  virtual bool flush(std::vector<std::uint8_t> *out) {
    (void)out;
    return false;
  }

  virtual void reset() = 0;

  virtual std::size_t inputWidth() const noexcept = 0;
  virtual std::size_t inputHeight() const noexcept = 0;
  virtual std::size_t outputWidth() const noexcept = 0;
  virtual std::size_t outputHeight() const noexcept = 0;
};

}  // namespace core
}  // namespace JoshUpscale

#endif  // JOSHUPSCALE_SRC_BACKEND_H_
