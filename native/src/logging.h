// Internal logging helpers over the pluggable LogSink
// (reference core/include/JoshUpscale/core/logging.h).

#ifndef JOSHUPSCALE_SRC_LOGGING_H_
#define JOSHUPSCALE_SRC_LOGGING_H_

#include <sstream>
#include <string>

#include "joshupscale/core.h"

namespace JoshUpscale {
namespace core {

void logMessage(LogLevel level, const std::string &msg) noexcept;

// Stream-style logger flushed on destruction (reference logging.h:28-45).
class LogLine {
 public:
  explicit LogLine(LogLevel level, const char *where)
      : m_level(level) {
    if (where != nullptr && *where != '\0') {
      m_stream << '[' << where << "] ";
    }
  }
  ~LogLine() { logMessage(m_level, m_stream.str()); }
  template <typename T>
  LogLine &operator<<(const T &value) {
    m_stream << value;
    return *this;
  }

 private:
  LogLevel m_level;
  std::ostringstream m_stream;
};

}  // namespace core
}  // namespace JoshUpscale

#define JOSHUPSCALE_LOG_INFO \
  ::JoshUpscale::core::LogLine(::JoshUpscale::core::LogLevel::INFO, __func__)
#define JOSHUPSCALE_LOG_WARN                                      \
  ::JoshUpscale::core::LogLine(::JoshUpscale::core::LogLevel::WARNING, \
                               __func__)
#define JOSHUPSCALE_LOG_ERROR \
  ::JoshUpscale::core::LogLine(::JoshUpscale::core::LogLevel::ERROR, __func__)

#endif  // JOSHUPSCALE_SRC_LOGGING_H_
