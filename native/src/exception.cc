// Nested-exception formatter (reference core/src/exception.cc:25-79):
// walks std::nested_exception causes and demangles the dynamic type of
// each level.

#include <cxxabi.h>

#include <cstdlib>
#include <exception>
#include <memory>
#include <sstream>
#include <string>
#include <typeinfo>

#include "joshupscale/core.h"

namespace JoshUpscale {
namespace core {

namespace {

std::string demangle(const char *name) {
  int status = 0;
  std::unique_ptr<char, void (*)(void *)> demangled(
      abi::__cxa_demangle(name, nullptr, nullptr, &status), std::free);
  return status == 0 && demangled ? demangled.get() : name;
}

void appendException(std::ostringstream &out, const std::exception &e,
                     int depth) {
  for (int i = 0; i < depth; ++i) {
    out << "  ";
  }
  if (depth > 0) {
    out << "caused by: ";
  }
  out << demangle(typeid(e).name()) << ": " << e.what();
  try {
    std::rethrow_if_nested(e);
  } catch (const std::exception &nested) {
    out << '\n';
    appendException(out, nested, depth + 1);
  } catch (...) {
    out << "\n  caused by: <unknown exception>";
  }
}

}  // namespace

std::string getExceptionString() {
  auto current = std::current_exception();
  if (!current) {
    return "<no exception>";
  }
  try {
    std::rethrow_exception(current);
  } catch (const std::exception &e) {
    std::ostringstream out;
    appendException(out, e, 0);
    return out.str();
  } catch (...) {
    return "<unknown exception>";
  }
}

}  // namespace core
}  // namespace JoshUpscale
