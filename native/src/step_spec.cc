#include "step_spec.h"

#include <fstream>
#include <sstream>
#include <stdexcept>

namespace JoshUpscale {
namespace core {

std::size_t dtypeSize(DType t) {
  switch (t) {
    case DType::kU8: return 1;
    case DType::kBF16:
    case DType::kF16: return 2;
    case DType::kF32:
    case DType::kI32: return 4;
    case DType::kF64: return 8;
  }
  throw std::runtime_error("Unknown dtype");
}

DType dtypeFromString(const std::string &s) {
  if (s == "u8") return DType::kU8;
  if (s == "f32") return DType::kF32;
  if (s == "bf16") return DType::kBF16;
  if (s == "f16") return DType::kF16;
  if (s == "i32") return DType::kI32;
  if (s == "f64") return DType::kF64;
  throw std::runtime_error("Unknown dtype in step spec: " + s);
}

std::size_t TensorSpec::numElements() const {
  std::size_t n = 1;
  for (std::int64_t d : dims) {
    if (d <= 0) {
      throw std::runtime_error("Non-positive dim in step spec");
    }
    n *= static_cast<std::size_t>(d);
  }
  return n;
}

namespace {

TensorSpec parseTensor(std::istringstream *line) {
  std::string dtype;
  std::string dims;
  if (!(*line >> dtype >> dims)) {
    throw std::runtime_error("Malformed tensor line in step spec");
  }
  TensorSpec t{dtypeFromString(dtype), {}};
  std::istringstream ds(dims);
  std::string part;
  while (std::getline(ds, part, ',')) {
    try {
      t.dims.push_back(std::stoll(part));
    } catch (const std::exception &) {
      throw std::runtime_error("Bad dim '" + part + "' in step spec");
    }
  }
  if (t.dims.empty()) {
    throw std::runtime_error("Empty dims in step spec");
  }
  return t;
}

}  // namespace

StepSpec parseStepSpec(const std::string &path) {
  std::ifstream f(path);
  if (!f) {
    throw std::runtime_error("Cannot open step spec: " + path);
  }
  std::string header;
  std::getline(f, header);
  if (header.rfind("joshupscale-step-spec 1", 0) != 0) {
    throw std::runtime_error("Bad step spec header: " + header);
  }
  StepSpec spec;
  std::string line;
  while (std::getline(f, line)) {
    if (line.empty() || line[0] == '#') {
      continue;
    }
    std::istringstream ls(line);
    std::string key;
    ls >> key;
    if (key == "frame_height") {
      ls >> spec.frameHeight;
    } else if (key == "frame_width") {
      ls >> spec.frameWidth;
    } else if (key == "scale") {
      ls >> spec.scale;
    } else if (key == "input") {
      spec.inputs.push_back(parseTensor(&ls));
    } else if (key == "output") {
      spec.outputs.push_back(parseTensor(&ls));
    } else if (key == "alias") {
      int out = -1;
      int arg = -1;
      if (!(ls >> out >> arg)) {
        throw std::runtime_error("Malformed alias line in step spec");
      }
      spec.aliases.emplace_back(out, arg);
    } else {
      throw std::runtime_error("Unknown step spec key: " + key);
    }
  }
  if (spec.frameHeight == 0 || spec.frameWidth == 0 ||
      spec.inputs.empty() || spec.outputs.empty()) {
    throw std::runtime_error("Incomplete step spec: " + path);
  }
  if (spec.inputs.size() != spec.outputs.size()) {
    // The serving loop rotates outputs[1:] into inputs[1:] (frame in,
    // display out, state ping-pong); a mismatched spec would fail
    // frames later with an opaque wrong-arg-count plugin error.
    throw std::runtime_error(
        "Step spec input/output count mismatch: " + path);
  }
  for (const auto &[out, arg] : spec.aliases) {
    if (out < 0 || static_cast<std::size_t>(out) >= spec.outputs.size() ||
        arg < 0 || static_cast<std::size_t>(arg) >= spec.inputs.size()) {
      throw std::runtime_error("Alias index out of range in step spec");
    }
    if (spec.outputs[out].byteSize() != spec.inputs[arg].byteSize()) {
      throw std::runtime_error("Alias size mismatch in step spec");
    }
  }
  return spec;
}

}  // namespace core
}  // namespace JoshUpscale
