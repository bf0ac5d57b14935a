// Executable fake libobs host: IMPLEMENTS the clean-room stub API
// (third_party/stubs/obs/) with real semantics and drives the actual
// OBS filter shim (plugins/obs/filter.cc + plugin.cc) end to end --
// create -> update (model swap) -> video_tick -> video_render with a
// staged frame -- the callback paths the reference plugin exercises
// inside OBS Studio (/root/reference/obs_plugin/src/filter.cc:182-226).
// The real SDK is absent from this image; this host makes the shim's
// own code RUN in CI instead of merely compiling.
//
// Model runtimes load through the normal createRuntime path; with
// JOSHUPSCALE_PJRT_PLUGIN pointing at the in-repo mock plugin the whole
// process is Python-free and the display bytes follow the mock's
// deterministic rule (tests/test_native.py replicates it).  Because the
// mock reads its shapes from MOCK_PJRT_SPEC, obs_find_module_file
// points that variable at the model package being resolved (a test-host
// convenience; a real plugin knows its own program signature).
//
// Scenario (driven from main(), exits non-zero on any failure):
//   1. load module, create the filter with preset=quality/PSP
//   2. render -> presented frame dumped (psp_0.raw)
//   3. render again without tick -> 30 FPS pacing suppresses reprocess
//   4. tick past the budget, render -> recurrent frame 1 (psp_1.raw)
//   5. update() swaps to the PS2 model -> masked HUD compose path
//      (ps2_0.raw), input re-staged at the new model size
//   6. update() to a MISSING model -> error fallback: render skips the
//      filter; a later update() back to a valid model recovers
//   7. destroy + unload; graphics enter/leave balance checked
//
// Usage: fake_obs_host <module_data_dir> <out_dir>

#include <graphics/graphics.h>
#include <graphics/image-file.h>
#include <obs-module.h>

#include <cstdarg>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <map>
#include <string>
#include <vector>

#include "joshupscale/png.h"

// ---------------------------------------------------------------------
// Host state

namespace {

std::string g_dataDir;
int g_graphicsDepth = 0;
int g_failures = 0;

#define HOST_CHECK(cond)                                              \
  do {                                                                \
    if (!(cond)) {                                                    \
      std::fprintf(stderr, "HOST_CHECK failed at %s:%d: %s\n",        \
                   __FILE__, __LINE__, #cond);                        \
      ++g_failures;                                                   \
    }                                                                 \
  } while (0)

struct FakeTexture {
  uint32_t w = 0;
  uint32_t h = 0;
  std::vector<uint8_t> rgba;  // BGRX, w*h*4
};

struct FakeSource {
  uint32_t baseW = 0;
  uint32_t baseH = 0;
  std::vector<uint8_t> frame;  // BGRX at baseW x baseH
  FakeSource *target = nullptr;
  int skipped = 0;
  int rendered = 0;  // obs_source_video_render calls (model processes)
};

struct FakeData {
  std::map<std::string, long long> ints;
  std::map<std::string, bool> bools;
  std::map<std::string, long long> defInts;
  std::map<std::string, bool> defBools;
};

FakeTexture *g_renderTarget = nullptr;  // inside texrender begin/end
FakeTexture g_presented;                // last gs_draw_sprite target
bool g_effectLoopFlip = false;

}  // namespace

struct gs_texture {
  FakeTexture impl;
};
struct gs_stage_surface {
  FakeTexture impl;
};
struct gs_texture_render {
  FakeTexture impl;
};
struct gs_effect {
  int dummy;
};
struct gs_effect_param {
  int dummy;
};
struct obs_data {
  FakeData impl;
};
struct obs_source {
  FakeSource impl;
};
struct obs_properties {
  int dummy;
};
struct obs_property {
  int dummy;
};
struct obs_module {
  int dummy;
};

extern "C" {

// ---- logging / memory -------------------------------------------------
void blog(int level, const char *format, ...) {
  std::va_list ap;
  va_start(ap, format);
  std::fprintf(stderr, "[blog %d] ", level);
  std::vfprintf(stderr, format, ap);
  std::fprintf(stderr, "\n");
  va_end(ap);
}

void bfree(void *ptr) { std::free(ptr); }

// ---- module ------------------------------------------------------------
char *obs_find_module_file(obs_module_t *, const char *file) {
  std::string path = g_dataDir + "/" + file;
  std::ifstream probe(path);
  std::ifstream dirProbe(path + "/step_spec.txt");
  if (!probe.good() && !dirProbe.good()) {
    return nullptr;
  }
  if (dirProbe.good()) {
    // Model package: point the mock PJRT plugin at its signature
    // before the filter calls createRuntime on it.
    setenv("MOCK_PJRT_SPEC", (path + "/step_spec.txt").c_str(), 1);
  }
  char *out = static_cast<char *>(std::malloc(path.size() + 1));
  std::memcpy(out, path.c_str(), path.size() + 1);
  return out;
}

const char *obs_module_get_locale_text(obs_module_t *, const char *text) {
  return text;
}

// ---- settings / properties ---------------------------------------------
long long obs_data_get_int(obs_data_t *data, const char *name) {
  auto it = data->impl.ints.find(name);
  if (it != data->impl.ints.end()) {
    return it->second;
  }
  auto dit = data->impl.defInts.find(name);
  return dit != data->impl.defInts.end() ? dit->second : 0;
}

bool obs_data_get_bool(obs_data_t *data, const char *name) {
  auto it = data->impl.bools.find(name);
  if (it != data->impl.bools.end()) {
    return it->second;
  }
  auto dit = data->impl.defBools.find(name);
  return dit != data->impl.defBools.end() && dit->second;
}

void obs_data_set_default_int(obs_data_t *data, const char *name,
                              long long val) {
  data->impl.defInts[name] = val;
}

void obs_data_set_default_bool(obs_data_t *data, const char *name,
                               bool val) {
  data->impl.defBools[name] = val;
}

obs_properties_t *obs_properties_create(void) {
  return new obs_properties;
}
obs_property_t *obs_properties_add_list(obs_properties_t *, const char *,
                                        const char *, enum obs_combo_type,
                                        enum obs_combo_format) {
  static obs_property p;
  return &p;
}
size_t obs_property_list_add_int(obs_property_t *, const char *,
                                 long long) {
  return 0;
}
obs_property_t *obs_properties_add_bool(obs_properties_t *, const char *,
                                        const char *) {
  static obs_property p;
  return &p;
}

// ---- sources -------------------------------------------------------------
uint32_t obs_source_get_base_width(obs_source_t *source) {
  return source != nullptr ? source->impl.baseW : 0;
}
uint32_t obs_source_get_base_height(obs_source_t *source) {
  return source != nullptr ? source->impl.baseH : 0;
}
obs_source_t *obs_filter_get_target(obs_source_t *filter) {
  return reinterpret_cast<obs_source_t *>(
      reinterpret_cast<FakeSource *>(&filter->impl)->target);
}
void obs_source_skip_video_filter(obs_source_t *filter) {
  ++filter->impl.skipped;
}

// Draw `source`'s frame scaled (nearest) into the current render
// target -- the semantics the filter relies on: gs_ortho mapped the
// full source extent onto the texrender viewport.
void obs_source_video_render(obs_source_t *source) {
  FakeSource &src = source->impl;
  ++src.rendered;
  if (g_renderTarget == nullptr || src.baseW == 0 || src.baseH == 0) {
    return;
  }
  FakeTexture &dst = *g_renderTarget;
  for (uint32_t y = 0; y < dst.h; ++y) {
    uint32_t sy = y * src.baseH / dst.h;
    for (uint32_t x = 0; x < dst.w; ++x) {
      uint32_t sx = x * src.baseW / dst.w;
      std::memcpy(&dst.rgba[(static_cast<size_t>(y) * dst.w + x) * 4],
                  &src.frame[(static_cast<size_t>(sy) * src.baseW + sx)
                             * 4],
                  4);
    }
  }
}

gs_effect_t *obs_get_base_effect(enum obs_base_effect) {
  static gs_effect e;
  return &e;
}
void obs_enter_graphics(void) { ++g_graphicsDepth; }
void obs_leave_graphics(void) { --g_graphicsDepth; }

// ---- graphics -------------------------------------------------------------
gs_texrender_t *gs_texrender_create(enum gs_color_format,
                                    enum gs_zstencil_format) {
  return new gs_texture_render;
}
void gs_texrender_destroy(gs_texrender_t *t) { delete t; }
void gs_texrender_reset(gs_texrender_t *) {}
bool gs_texrender_begin(gs_texrender_t *t, uint32_t cx, uint32_t cy) {
  t->impl.w = cx;
  t->impl.h = cy;
  t->impl.rgba.assign(static_cast<size_t>(cx) * cy * 4, 0);
  g_renderTarget = &t->impl;
  return true;
}
void gs_texrender_end(gs_texrender_t *) { g_renderTarget = nullptr; }
gs_texture_t *gs_texrender_get_texture(const gs_texrender_t *t) {
  // The filter immediately stages this texture; handing back the
  // texrender's own storage (const_cast) keeps the fake simple.
  return reinterpret_cast<gs_texture_t *>(
      const_cast<gs_texture_render *>(t));
}

gs_stagesurf_t *gs_stagesurface_create(uint32_t width, uint32_t height,
                                       enum gs_color_format) {
  auto *s = new gs_stage_surface;
  s->impl.w = width;
  s->impl.h = height;
  s->impl.rgba.assign(static_cast<size_t>(width) * height * 4, 0);
  return s;
}
void gs_stagesurface_destroy(gs_stagesurf_t *s) { delete s; }
bool gs_stagesurface_map(gs_stagesurf_t *s, uint8_t **data,
                         uint32_t *linesize) {
  *data = s->impl.rgba.data();
  *linesize = s->impl.w * 4;
  return true;
}
void gs_stagesurface_unmap(gs_stagesurf_t *) {}
void gs_stage_texture(gs_stagesurf_t *dst, gs_texture_t *src) {
  HOST_CHECK(src->impl.w == dst->impl.w && src->impl.h == dst->impl.h);
  dst->impl.rgba = src->impl.rgba;
}

gs_texture_t *gs_texture_create(uint32_t width, uint32_t height,
                                enum gs_color_format, uint32_t,
                                const uint8_t **, uint32_t) {
  auto *t = new gs_texture;
  t->impl.w = width;
  t->impl.h = height;
  t->impl.rgba.assign(static_cast<size_t>(width) * height * 4, 0);
  return t;
}
void gs_texture_destroy(gs_texture_t *t) { delete t; }
void gs_texture_set_image(gs_texture_t *t, const uint8_t *data,
                          uint32_t linesize, bool invert) {
  HOST_CHECK(!invert);
  for (uint32_t y = 0; y < t->impl.h; ++y) {
    std::memcpy(&t->impl.rgba[static_cast<size_t>(y) * t->impl.w * 4],
                data + static_cast<size_t>(y) * linesize, t->impl.w * 4);
  }
}

void gs_clear(uint32_t, const struct vec4 *, float, uint8_t) {
  if (g_renderTarget != nullptr) {
    std::fill(g_renderTarget->rgba.begin(), g_renderTarget->rgba.end(),
              0);
  }
}
void gs_ortho(float, float, float, float, float, float) {}

gs_eparam_t *gs_effect_get_param_by_name(const gs_effect_t *,
                                         const char *) {
  static gs_effect_param p;
  return &p;
}
void gs_effect_set_texture(gs_eparam_t *, gs_texture_t *) {}
bool gs_effect_loop(gs_effect_t *, const char *) {
  g_effectLoopFlip = !g_effectLoopFlip;
  return g_effectLoopFlip;  // true once, then false
}
void gs_draw_sprite(gs_texture_t *tex, uint32_t, uint32_t, uint32_t) {
  g_presented = tex->impl;
}
void gs_blend_state_push(void) {}
void gs_blend_state_pop(void) {}
void gs_reset_blend_state(void) {}

// ---- image file (PS2 HUD mask) -------------------------------------------
void gs_image_file_init(gs_image_file_t *image, const char *file) {
  std::memset(image, 0, sizeof(*image));
  try {
    std::size_t w = 0;
    std::size_t h = 0;
    std::vector<uint8_t> gray =
        JoshUpscale::core::loadMaskPng(file, &w, &h);
    image->cx = static_cast<uint32_t>(w);
    image->cy = static_cast<uint32_t>(h);
    image->texture_data =
        static_cast<uint8_t *>(std::malloc(gray.size() * 4));
    for (std::size_t i = 0; i < gray.size(); ++i) {
      image->texture_data[i * 4 + 0] = gray[i];
      image->texture_data[i * 4 + 1] = gray[i];
      image->texture_data[i * 4 + 2] = gray[i];
      image->texture_data[i * 4 + 3] = 0xFF;
    }
    image->loaded = true;
  } catch (...) {
    image->loaded = false;
  }
}
void gs_image_file_free(gs_image_file_t *image) {
  std::free(image->texture_data);
  std::memset(image, 0, sizeof(*image));
}

}  // extern "C"

// Module entry points are defined in plugins/obs/plugin.cc with C++
// linkage (the OBS_DECLARE_MODULE macro expands outside extern "C").
bool obs_module_load(void);
void obs_module_unload(void);

// ---------------------------------------------------------------------
// Driver

namespace {

obs_source_info *g_info = nullptr;

// Deterministic BGRX source pattern at the model input size;
// tests/test_native.py regenerates the same bytes in numpy.
void stagePattern(FakeSource *src, uint32_t w, uint32_t h) {
  src->baseW = w;
  src->baseH = h;
  src->frame.resize(static_cast<size_t>(w) * h * 4);
  for (uint32_t y = 0; y < h; ++y) {
    for (uint32_t x = 0; x < w; ++x) {
      uint8_t *px = &src->frame[(static_cast<size_t>(y) * w + x) * 4];
      for (int c = 0; c < 3; ++c) {
        px[c] = static_cast<uint8_t>((y * 31 + x * 7 + c * 3) % 256);
      }
      px[3] = 0xFF;
    }
  }
}

bool dumpPresented(const std::string &path) {
  std::ofstream f(path, std::ios::binary);
  f.write(reinterpret_cast<const char *>(g_presented.rgba.data()),
          static_cast<std::streamsize>(g_presented.rgba.size()));
  std::printf("dumped %s %u %u\n", path.c_str(), g_presented.w,
              g_presented.h);
  return f.good();
}

}  // namespace

extern "C" {
void obs_register_source(struct obs_source_info *info) { g_info = info; }
}

int main(int argc, char **argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s <module_data_dir> <out_dir>\n",
                 argv[0]);
    return 2;
  }
  g_dataDir = argv[1];
  const std::string outDir = argv[2];

  HOST_CHECK(obs_module_load());
  HOST_CHECK(g_info != nullptr && g_info->create != nullptr);

  obs_data settings;
  g_info->get_defaults2(nullptr, &settings);
  HOST_CHECK(obs_data_get_bool(&settings, "limit_fps"));
  obs_properties_t *props = g_info->get_properties2(nullptr, nullptr);
  HOST_CHECK(props != nullptr);
  delete props;

  obs_source target;   // the filtered source (game capture)
  obs_source filter;   // the filter's own source handle
  filter.impl.target = &target.impl;

  // 1. create with quality/PSP defaults -> loads model_psp
  void *data = g_info->create(&settings, &filter);
  HOST_CHECK(data != nullptr);
  const uint32_t outW = g_info->get_width(data);
  const uint32_t outH = g_info->get_height(data);
  HOST_CHECK(outW % 4 == 0 && outH % 4 == 0 && outW > 0 && outH > 0);
  stagePattern(&target.impl, outW / 4, outH / 4);

  // 2. first render processes (pacer starts pending)
  g_info->video_render(data, nullptr);
  HOST_CHECK(target.impl.rendered == 1);
  HOST_CHECK(g_presented.w == outW && g_presented.h == outH);
  HOST_CHECK(dumpPresented(outDir + "/psp_0.raw"));

  // 3. render again with only a tiny tick: 30 FPS pacing suppresses
  g_info->video_tick(data, 0.001F);
  g_info->video_render(data, nullptr);
  HOST_CHECK(target.impl.rendered == 1);

  // 4. tick past the budget -> reprocess -> recurrent frame 1
  g_info->video_tick(data, 1.0F);
  g_info->video_render(data, nullptr);
  HOST_CHECK(target.impl.rendered == 2);
  HOST_CHECK(dumpPresented(outDir + "/psp_1.raw"));

  // 5. swap to the PS2 model (masked HUD compose path)
  settings.impl.ints["resolution"] = 1;
  g_info->update(data, &settings);
  const uint32_t outW2 = g_info->get_width(data);
  const uint32_t outH2 = g_info->get_height(data);
  HOST_CHECK(outW2 > 0 && outH2 > 0);
  stagePattern(&target.impl, outW2 / 4, outH2 / 4);
  g_info->video_tick(data, 1.0F);
  g_info->video_render(data, nullptr);
  HOST_CHECK(g_presented.w == outW2 && g_presented.h == outH2);
  HOST_CHECK(dumpPresented(outDir + "/ps2_0.raw"));

  // 6. swap to a MISSING model -> error fallback: the filter must
  //    skip itself instead of crashing, then recover on a valid update
  settings.impl.ints["preset"] = 1;  // model_ps2_fast (absent)
  g_info->update(data, &settings);
  const int skippedBefore = filter.impl.skipped;
  g_info->video_tick(data, 1.0F);
  g_info->video_render(data, nullptr);
  HOST_CHECK(filter.impl.skipped == skippedBefore + 1);
  // width falls back to the target's base size while dead
  HOST_CHECK(g_info->get_width(data) == target.impl.baseW);

  settings.impl.ints["preset"] = 0;  // back to model_ps2
  g_info->update(data, &settings);
  stagePattern(&target.impl, outW2 / 4, outH2 / 4);
  g_info->video_tick(data, 1.0F);
  g_info->video_render(data, nullptr);
  HOST_CHECK(g_presented.w == outW2 && g_presented.h == outH2);
  HOST_CHECK(dumpPresented(outDir + "/ps2_recovered.raw"));

  // 6b. hand-edited scene JSON: out-of-range settings must clamp to
  //     the default model instead of indexing past the 4-entry table
  settings.impl.ints["preset"] = 7;
  settings.impl.ints["resolution"] = 9;
  g_info->update(data, &settings);
  stagePattern(&target.impl, target.impl.baseW, target.impl.baseH);
  g_info->video_tick(data, 1.0F);
  g_info->video_render(data, nullptr);
  HOST_CHECK(g_info->get_width(data) > 0);

  // 7. teardown
  g_info->destroy(data);
  obs_module_unload();
  HOST_CHECK(g_graphicsDepth == 0);

  if (g_failures != 0) {
    std::fprintf(stderr, "fake obs host: %d failures\n", g_failures);
    return 1;
  }
  std::printf("fake obs host OK\n");
  return 0;
}
