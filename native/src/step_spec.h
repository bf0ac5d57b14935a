// Parser for the package's step_spec.txt: the flat I/O signature of the
// exported StableHLO serving step (written by
// joshupscale_tpu/export/package.py::_write_native_serving_artifacts).
// Shared by the PJRT backend and the mock PJRT plugin used in tests.

#ifndef JOSHUPSCALE_SRC_STEP_SPEC_H_
#define JOSHUPSCALE_SRC_STEP_SPEC_H_

#include <cstdint>
#include <string>
#include <utility>
#include <vector>

namespace JoshUpscale {
namespace core {

enum class DType {
  kU8,
  kF32,
  kBF16,
  kF16,
  kI32,
  kF64,
};

std::size_t dtypeSize(DType t);
DType dtypeFromString(const std::string &s);

struct TensorSpec {
  DType dtype;
  std::vector<std::int64_t> dims;

  std::size_t numElements() const;
  std::size_t byteSize() const { return numElements() * dtypeSize(dtype); }
};

struct StepSpec {
  std::size_t frameHeight = 0;
  std::size_t frameWidth = 0;
  std::size_t scale = 4;
  std::vector<TensorSpec> inputs;   // [frame, state...]
  std::vector<TensorSpec> outputs;  // [display, new state...]
  // (output index, argument index) donation pairs.
  std::vector<std::pair<int, int>> aliases;
};

// Parses the spec file; throws std::runtime_error with a descriptive
// message on malformed input.
StepSpec parseStepSpec(const std::string &path);

}  // namespace core
}  // namespace JoshUpscale

#endif  // JOSHUPSCALE_SRC_STEP_SPEC_H_
