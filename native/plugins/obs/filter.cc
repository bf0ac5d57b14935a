// OBS Studio filter shim over the TPU runtime.
//
// Behavioural parity with the reference OBS plugin
// (obs_plugin/src/filter.cc): a video filter with quality/performance x
// PSP/PS2 model selection, a 30 FPS pacing cap ("Limit to 30 FPS"), and
// the PS2 masked-HUD re-overlay.  TPU adaptation: there is no shared-
// texture path to a TPU, so instead of D3D11/GL interop images the shim
// stages the rendered source to CPU (gs_stagesurface), feeds BGR24 host
// frames through the C++ core (which overlaps host<->device transfer
// with compute), and uploads the upscaled frame back into an output
// texture.  The masked compose runs on the CPU frame (compose.cc)
// rather than as a GPU blend pass.
//
// Build: requires the OBS SDK (obs-module.h); the CMake target is only
// added when JOSHUPSCALE_OBS_INCLUDE_DIR is found.  The pacing and
// compose logic this shim uses is host-API-free and unit-tested through
// the C ABI (tests/test_native.py) even when the SDK is absent.

#if defined(__has_include)
#if __has_include(<obs-module.h>)
#define JOSHUPSCALE_HAVE_OBS 1
#endif
#endif

#ifdef JOSHUPSCALE_HAVE_OBS

#include <graphics/graphics.h>
#include <graphics/image-file.h>
#include <obs-module.h>

#include <cstdint>
#include <cstring>
#include <memory>
#include <stdexcept>
#include <string>
#include <vector>

#include "joshupscale/compose.h"
#include "joshupscale/core.h"
#include "joshupscale/pacing.h"

namespace JoshUpscale {
namespace obs {

namespace {

// Model packages shipped in the module data dir (reference
// filter.cc:138-143 ships .trt engines; here they are package
// directories produced by joshupscale_tpu.export.package).
const char *kModels[4] = {
    "model_psp",
    "model_psp_fast",
    "model_ps2",
    "model_ps2_fast",
};

struct ObsPathDeleter {
  void operator()(char *p) const noexcept { bfree(p); }
};
using ObsPath = std::unique_ptr<char, ObsPathDeleter>;

}  // namespace

class Filter {
 public:
  Filter(::obs_data_t *settings, ::obs_source_t *source)
      : m_source(source) {
    // PS2 HUD mask (reference data/mask.png).
    ObsPath maskFile(::obs_module_file("mask.png"));
    if (maskFile != nullptr) {
      ::gs_image_file_init(&m_maskImage, maskFile.get());
      if (m_maskImage.loaded) {
        buildMask();
      }
    }
    update(settings);
  }

  ~Filter() {
    ::obs_enter_graphics();
    freeGraphics();
    ::gs_image_file_free(&m_maskImage);
    ::obs_leave_graphics();
  }

  static const char *getName(void *) noexcept {
    return ::obs_module_text("Name");
  }

  void update(::obs_data_t *settings) noexcept {
    const auto preset = ::obs_data_get_int(settings, "preset");
    const auto resolution = ::obs_data_get_int(settings, "resolution");
    m_maskedTarget = resolution == 1;
    m_pacer.setLimitFps(::obs_data_get_bool(settings, "limit_fps"));
    // preset/resolution come from persisted scene JSON (untrusted:
    // hand-edited files or scripts can store any int) -- clamp before
    // indexing the 4-entry model table.
    const int requested = static_cast<int>(resolution * 2 + preset);
    const int model = (requested >= 0 && requested < 4) ? requested : 0;
    if (model != m_model) {
      // initModel runs the slow part (model load + XLA compile,
      // seconds to minutes) OUTSIDE the graphics lock so the OBS
      // compositor keeps rendering the old runtime; only the final
      // pointer/texture swap excludes render() (see initModel).
      if (initModel(kModels[model])) {
        // Only remember the selection on success: a transient load
        // failure must be retried on the next update() with the same
        // preset instead of leaving the filter permanently dead.
        m_model = model;
      } else {
        m_model = -1;
      }
    }
  }

  static void getDefaults(void *, ::obs_data_t *settings) noexcept {
    ::obs_data_set_default_int(settings, "preset", 0);
    ::obs_data_set_default_int(settings, "resolution", 0);
    ::obs_data_set_default_bool(settings, "limit_fps", true);
  }

  static ::obs_properties_t *getProperties(void *, void *) noexcept {
    ::obs_properties_t *props = ::obs_properties_create();
    ::obs_property_t *preset = ::obs_properties_add_list(
        props, "preset", ::obs_module_text("Preset"),
        OBS_COMBO_TYPE_LIST, OBS_COMBO_FORMAT_INT);
    ::obs_property_list_add_int(
        preset, ::obs_module_text("PresetQuality"), 0);
    ::obs_property_list_add_int(
        preset, ::obs_module_text("PresetPerformance"), 1);
    ::obs_property_t *res = ::obs_properties_add_list(
        props, "resolution", ::obs_module_text("Resolution"),
        OBS_COMBO_TYPE_LIST, OBS_COMBO_FORMAT_INT);
    ::obs_property_list_add_int(
        res, ::obs_module_text("ResolutionPSP"), 0);
    ::obs_property_list_add_int(
        res, ::obs_module_text("ResolutionPS2"), 1);
    ::obs_properties_add_bool(props, "limit_fps",
                              ::obs_module_text("LimitFps"));
    return props;
  }

  void videoTick(float seconds) noexcept { m_pacer.tick(seconds); }

  std::uint32_t getWidth() noexcept {
    if (m_runtime == nullptr) {
      return ::obs_source_get_base_width(
          ::obs_filter_get_target(m_source));
    }
    return static_cast<std::uint32_t>(m_runtime->getOutputWidth());
  }

  std::uint32_t getHeight() noexcept {
    if (m_runtime == nullptr) {
      return ::obs_source_get_base_height(
          ::obs_filter_get_target(m_source));
    }
    return static_cast<std::uint32_t>(m_runtime->getOutputHeight());
  }

  void render(::gs_effect_t *) noexcept {
    ::obs_source_t *target = ::obs_filter_get_target(m_source);
    if (m_runtime == nullptr || target == nullptr ||
        ::obs_source_get_base_width(target) == 0) {
      ::obs_source_skip_video_filter(m_source);
      return;
    }
    if (m_pacer.shouldProcess()) {
      if (!processFrame(target)) {
        ::obs_source_skip_video_filter(m_source);
        return;
      }
      m_pacer.markProcessed();
    }
    if (m_outputTexture == nullptr) {
      ::obs_source_skip_video_filter(m_source);
      return;
    }
    ::gs_effect_t *effect = ::obs_get_base_effect(OBS_EFFECT_DEFAULT);
    ::gs_eparam_t *image =
        ::gs_effect_get_param_by_name(effect, "image");
    ::gs_blend_state_push();
    ::gs_reset_blend_state();
    ::gs_effect_set_texture(image, m_outputTexture);
    while (::gs_effect_loop(effect, "Draw")) {
      ::gs_draw_sprite(m_outputTexture, 0, 0, 0);
    }
    ::gs_blend_state_pop();
  }

  // obs_source_info callbacks ------------------------------------------

  static void *create(::obs_data_t *settings,
                      ::obs_source_t *source) noexcept {
    try {
      return new Filter(settings, source);
    } catch (...) {
      blog(LOG_ERROR, "[joshupscale] %s",
           core::getExceptionString().c_str());
      return nullptr;
    }
  }

  static void destroy(void *data) noexcept {
    delete static_cast<Filter *>(data);
  }

 private:
  bool initModel(const char *model) noexcept {
    ObsPath modelPath(::obs_module_file(model));
    try {
      if (modelPath == nullptr) {
        throw std::runtime_error(std::string("Model not found: ") +
                                 model);
      }
      // Build the REPLACEMENT runtime outside the graphics lock: the
      // XLA compile takes seconds to minutes, and holding the global
      // graphics mutex for it would freeze every OBS scene/source.
      // render() keeps serving the old runtime until the swap below.
      std::unique_ptr<core::Runtime> next(
          core::createRuntime(0, modelPath.get()));
      const auto inW = next->getInputWidth();
      const auto inH = next->getInputHeight();
      const auto outW = next->getOutputWidth();
      const auto outH = next->getOutputHeight();
      // Brief exclusion of render() (the graphics context is
      // per-thread refcounted): swap the runtime pointer and the
      // buffers/textures render() touches -- no use-after-free
      // window, no compositor stall.
      ::obs_enter_graphics();
      m_runtime = std::move(next);
      m_inFrame.resize(inW * inH * 3);
      m_outFrame.resize(outW * outH * 3);
      m_outUpload.resize(outW * outH * 4);
      freeGraphics();
      m_renderInput = ::gs_texrender_create(GS_BGRX_UNORM, GS_ZS_NONE);
      m_stage = ::gs_stagesurface_create(
          static_cast<std::uint32_t>(inW),
          static_cast<std::uint32_t>(inH), GS_BGRX_UNORM);
      m_outputTexture = ::gs_texture_create(
          static_cast<std::uint32_t>(outW),
          static_cast<std::uint32_t>(outH), GS_BGRX, 1, nullptr,
          GS_DYNAMIC);
      ::obs_leave_graphics();
      m_pacer.invalidate();
      blog(LOG_INFO, "[joshupscale] loaded model: %s", model);
      return true;
    } catch (...) {
      blog(LOG_ERROR, "[joshupscale] %s",
           core::getExceptionString().c_str());
      // A failed swap leaves the filter in the documented error state
      // (runtime absent -> render() skips the filter); exclude
      // render() while clearing.
      ::obs_enter_graphics();
      m_runtime.reset();
      ::obs_leave_graphics();
      return false;
    }
  }

  void freeGraphics() noexcept {
    if (m_renderInput != nullptr) {
      ::gs_texrender_destroy(m_renderInput);
      m_renderInput = nullptr;
    }
    if (m_stage != nullptr) {
      ::gs_stagesurface_destroy(m_stage);
      m_stage = nullptr;
    }
    if (m_outputTexture != nullptr) {
      ::gs_texture_destroy(m_outputTexture);
      m_outputTexture = nullptr;
    }
  }

  // Decode the (RGBA) mask image into the grayscale keep-map the
  // compose step consumes (255 = keep upscale; the reference blend
  // shader uses 1 - mean(rgb)).
  void buildMask() {
    const auto w = m_maskImage.cx;
    const auto h = m_maskImage.cy;
    const auto *data =
        static_cast<const std::uint8_t *>(m_maskImage.texture_data);
    if (data == nullptr || w == 0 || h == 0) {
      return;
    }
    m_mask.resize(static_cast<std::size_t>(w) * h);
    for (std::size_t i = 0; i < m_mask.size(); ++i) {
      const std::uint8_t *px = data + i * 4;
      m_mask[i] = static_cast<std::uint8_t>(
          (px[0] + px[1] + px[2]) / 3);
    }
    m_maskW = w;
    m_maskH = h;
  }

  bool processFrame(::obs_source_t *target) noexcept {
    const auto inW =
        static_cast<std::uint32_t>(m_runtime->getInputWidth());
    const auto inH =
        static_cast<std::uint32_t>(m_runtime->getInputHeight());
    // Render the source scaled to the model input size.
    ::gs_texrender_reset(m_renderInput);
    if (!::gs_texrender_begin(m_renderInput, inW, inH)) {
      return false;
    }
    ::vec4 clear;
    ::vec4_zero(&clear);
    ::gs_clear(GS_CLEAR_COLOR, &clear, 0.0F, 0);
    const float tw =
        static_cast<float>(::obs_source_get_base_width(target));
    const float th =
        static_cast<float>(::obs_source_get_base_height(target));
    ::gs_ortho(0.0F, tw, 0.0F, th, -100.0F, 100.0F);
    ::obs_source_video_render(target);
    ::gs_texrender_end(m_renderInput);

    // Stage to CPU.
    ::gs_stage_texture(m_stage,
                       ::gs_texrender_get_texture(m_renderInput));
    std::uint8_t *mapped = nullptr;
    std::uint32_t pitch = 0;
    if (!::gs_stagesurface_map(m_stage, &mapped, &pitch)) {
      return false;
    }
    for (std::uint32_t y = 0; y < inH; ++y) {
      const std::uint8_t *src = mapped + y * pitch;
      std::uint8_t *dst = m_inFrame.data() +
                          static_cast<std::size_t>(y) * inW * 3;
      for (std::uint32_t x = 0; x < inW; ++x) {
        dst[x * 3 + 0] = src[x * 4 + 0];
        dst[x * 3 + 1] = src[x * 4 + 1];
        dst[x * 3 + 2] = src[x * 4 + 2];
      }
    }
    ::gs_stagesurface_unmap(m_stage);

    // Upscale + optional masked HUD compose, then upload.
    try {
      const auto outW = m_runtime->getOutputWidth();
      const auto outH = m_runtime->getOutputHeight();
      core::Image in{m_inFrame.data(), core::DataLocation::CPU,
                     static_cast<std::ptrdiff_t>(inW * 3), inW, inH};
      core::Image out{m_outFrame.data(), core::DataLocation::CPU,
                      static_cast<std::ptrdiff_t>(outW * 3), outW,
                      outH};
      m_runtime->processImage(in, out);
      if (m_maskedTarget && !m_mask.empty()) {
        core::Mask mask{m_mask.data(),
                        static_cast<std::ptrdiff_t>(m_maskW), m_maskW,
                        m_maskH};
        core::maskedCompose(out, in, mask);
      }
      for (std::size_t i = 0; i < outW * outH; ++i) {
        m_outUpload[i * 4 + 0] = m_outFrame[i * 3 + 0];
        m_outUpload[i * 4 + 1] = m_outFrame[i * 3 + 1];
        m_outUpload[i * 4 + 2] = m_outFrame[i * 3 + 2];
        m_outUpload[i * 4 + 3] = 0xFF;
      }
      const std::uint8_t *upload = m_outUpload.data();
      ::gs_texture_set_image(m_outputTexture, upload,
                             static_cast<std::uint32_t>(outW * 4),
                             false);
    } catch (...) {
      blog(LOG_ERROR, "[joshupscale] %s",
           core::getExceptionString().c_str());
      return false;
    }
    return true;
  }

  ::obs_source_t *m_source;
  std::unique_ptr<core::Runtime> m_runtime;
  core::FramePacer m_pacer;
  int m_model = -1;
  bool m_maskedTarget = false;

  ::gs_texrender_t *m_renderInput = nullptr;
  ::gs_stagesurf_t *m_stage = nullptr;
  ::gs_texture_t *m_outputTexture = nullptr;
  ::gs_image_file_t m_maskImage = {};

  std::vector<std::uint8_t> m_inFrame;
  std::vector<std::uint8_t> m_outFrame;
  std::vector<std::uint8_t> m_outUpload;
  std::vector<std::uint8_t> m_mask;
  std::uint32_t m_maskW = 0;
  std::uint32_t m_maskH = 0;
};

::obs_source_info *getSourceInfo() {
  static ::obs_source_info info = [] {
    ::obs_source_info i = {};
    i.id = "joshupscale_tpu";
    i.type = OBS_SOURCE_TYPE_FILTER;
    i.output_flags = OBS_SOURCE_VIDEO;
    i.get_name = &Filter::getName;
    i.create = &Filter::create;
    i.destroy = &Filter::destroy;
    i.update = [](void *d, ::obs_data_t *s) {
      static_cast<Filter *>(d)->update(s);
    };
    i.get_defaults2 = &Filter::getDefaults;
    i.get_properties2 = &Filter::getProperties;
    i.video_render = [](void *d, ::gs_effect_t *e) {
      static_cast<Filter *>(d)->render(e);
    };
    i.get_width = [](void *d) {
      return static_cast<Filter *>(d)->getWidth();
    };
    i.get_height = [](void *d) {
      return static_cast<Filter *>(d)->getHeight();
    };
    i.video_tick = [](void *d, float s) {
      static_cast<Filter *>(d)->videoTick(s);
    };
    return i;
  }();
  return &info;
}

}  // namespace obs
}  // namespace JoshUpscale

#endif  // JOSHUPSCALE_HAVE_OBS
