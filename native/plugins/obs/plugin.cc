// OBS module entry points (reference obs_plugin/src/plugin.cc):
// registers the JoshUpscale filter source and routes the core's log
// sink into OBS's blog.

#if defined(__has_include)
#if __has_include(<obs-module.h>)
#define JOSHUPSCALE_HAVE_OBS 1
#endif
#endif

#ifdef JOSHUPSCALE_HAVE_OBS

#include <obs-module.h>

#include "joshupscale/core.h"

OBS_DECLARE_MODULE()
OBS_MODULE_USE_DEFAULT_LOCALE("joshupscale-tpu", "en-US")

namespace JoshUpscale {
namespace obs {

::obs_source_info *getSourceInfo();

namespace {

struct ObsLogSink : core::LogSink {
  void log(core::LogLevel level, const char *message) noexcept override {
    int blogLevel = LOG_INFO;
    switch (level) {
      case core::LogLevel::WARNING:
        blogLevel = LOG_WARNING;
        break;
      case core::LogLevel::ERROR:
        blogLevel = LOG_ERROR;
        break;
      default:
        break;
    }
    blog(blogLevel, "[joshupscale] %s", message);
  }
};

ObsLogSink g_logSink;

}  // namespace

}  // namespace obs
}  // namespace JoshUpscale

bool obs_module_load(void) {
  JoshUpscale::core::setLogSink(&JoshUpscale::obs::g_logSink);
  obs_register_source(JoshUpscale::obs::getSourceInfo());
  return true;
}

void obs_module_unload(void) {
  JoshUpscale::core::setLogSink(nullptr);
}

MODULE_EXPORT const char *obs_module_description(void) {
  return "JoshUpscale TPU real-time upscaler filter";
}

#endif  // JOSHUPSCALE_HAVE_OBS
