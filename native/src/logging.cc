// Log sink plumbing: console default with millisecond timestamps
// (reference core/src/logging.cc:50-62), swappable via setLogSink.

#include "logging.h"

#include <atomic>
#include <chrono>
#include <cstdio>
#include <ctime>
#include <mutex>

namespace JoshUpscale {
namespace core {

namespace {

class ConsoleSink : public LogSink {
 public:
  void log(LogLevel level, const char *message) noexcept override {
    using clock = std::chrono::system_clock;
    auto now = clock::now();
    auto ms = std::chrono::duration_cast<std::chrono::milliseconds>(
                  now.time_since_epoch())
                  .count() %
              1000;
    std::time_t t = clock::to_time_t(now);
    std::tm tm{};
    localtime_r(&t, &tm);
    char stamp[32];
    std::strftime(stamp, sizeof(stamp), "%H:%M:%S", &tm);
    const char *tag = level == LogLevel::ERROR     ? "ERROR"
                      : level == LogLevel::WARNING ? "WARN"
                                                   : "INFO";
    std::lock_guard<std::mutex> lock(m_mutex);
    std::fprintf(stderr, "[JoshUpscale %s.%03d %s] %s\n", stamp,
                 static_cast<int>(ms), tag, message);
  }

 private:
  std::mutex m_mutex;
};

ConsoleSink g_consoleSink;
std::atomic<LogSink *> g_sink{&g_consoleSink};

}  // namespace

void setLogSink(LogSink *sink) noexcept {
  g_sink.store(sink != nullptr ? sink : &g_consoleSink);
}

void logMessage(LogLevel level, const std::string &msg) noexcept {
  g_sink.load()->log(level, msg.c_str());
}

}  // namespace core
}  // namespace JoshUpscale
