// Minimal PNG mask decoder (see include/joshupscale/png.h).

#include "joshupscale/png.h"

#include <zlib.h>

#include <cstdio>
#include <cstring>
#include <memory>
#include <stdexcept>
#include <string>

namespace JoshUpscale {
namespace core {

namespace {

constexpr std::uint8_t kSignature[8] = {137, 'P', 'N', 'G',
                                        13,  10,  26,  10};

std::uint32_t readBe32(const std::uint8_t *p) {
  return (static_cast<std::uint32_t>(p[0]) << 24) |
         (static_cast<std::uint32_t>(p[1]) << 16) |
         (static_cast<std::uint32_t>(p[2]) << 8) |
         static_cast<std::uint32_t>(p[3]);
}

[[noreturn]] void fail(const std::string &what) {
  throw std::runtime_error("loadMaskPng: " + what);
}

std::vector<std::uint8_t> inflateAll(const std::vector<std::uint8_t> &in,
                                     std::size_t expected) {
  std::vector<std::uint8_t> out(expected);
  ::z_stream strm = {};
  if (::inflateInit(&strm) != Z_OK) {
    fail("inflateInit failed");
  }
  strm.next_in = const_cast<std::uint8_t *>(in.data());
  strm.avail_in = static_cast<::uInt>(in.size());
  strm.next_out = out.data();
  strm.avail_out = static_cast<::uInt>(out.size());
  const int ret = ::inflate(&strm, Z_FINISH);
  ::inflateEnd(&strm);
  if (ret != Z_STREAM_END || strm.avail_out != 0) {
    fail("bad or truncated zlib stream");
  }
  return out;
}

std::uint8_t paeth(std::uint8_t a, std::uint8_t b, std::uint8_t c) {
  const int p = static_cast<int>(a) + b - c;
  const int pa = p > a ? p - a : a - p;
  const int pb = p > b ? p - b : b - p;
  const int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) {
    return a;
  }
  return pb <= pc ? b : c;
}

}  // namespace

std::vector<std::uint8_t> loadMaskPng(const char *path,
                                      std::size_t *width,
                                      std::size_t *height) {
  std::unique_ptr<std::FILE, int (*)(std::FILE *)> f(
      std::fopen(path, "rb"), &std::fclose);
  if (f == nullptr) {
    fail(std::string("cannot open ") + path);
  }
  std::uint8_t sig[8];
  if (std::fread(sig, 1, 8, f.get()) != 8 ||
      std::memcmp(sig, kSignature, 8) != 0) {
    fail("not a PNG file");
  }

  std::size_t w = 0;
  std::size_t h = 0;
  int colorType = -1;
  int channels = 0;
  std::vector<std::uint8_t> palette;  // RGB triples
  std::vector<std::uint8_t> idat;

  // Hostile-input bounds: chunk lengths are attacker-controlled 32-bit
  // fields, so bound every allocation BEFORE it happens and verify each
  // chunk's CRC32 (zlib's crc32 covers type+data per the PNG spec).
  std::size_t maxIdat = 0;  // known once IHDR arrives
  std::size_t idatSeen = 0;
  for (;;) {
    std::uint8_t head[8];
    if (std::fread(head, 1, 8, f.get()) != 8) {
      fail("truncated chunk header");
    }
    const std::uint32_t len = readBe32(head);
    const char *type = reinterpret_cast<const char *>(head + 4);
    const bool isIhdr = std::memcmp(type, "IHDR", 4) == 0;
    const bool isPlte = std::memcmp(type, "PLTE", 4) == 0;
    const bool isIdat = std::memcmp(type, "IDAT", 4) == 0;
    if (isIhdr && len != 13) {
      fail("bad IHDR");
    }
    if (isPlte && len > 3 * 256) {
      fail("oversized PLTE");
    }
    if (isIdat) {
      if (maxIdat == 0) {
        fail("IDAT before IHDR");
      }
      idatSeen += len;
      if (idatSeen > maxIdat) {
        fail("oversized IDAT stream");
      }
    } else if (len > (1u << 20)) {
      // No legitimate non-IDAT chunk in a mask asset approaches 1 MB.
      fail("oversized chunk");
    }
    std::vector<std::uint8_t> data(len);
    if (len != 0 && std::fread(data.data(), 1, len, f.get()) != len) {
      fail("truncated chunk data");
    }
    std::uint8_t crc[4];
    if (std::fread(crc, 1, 4, f.get()) != 4) {
      fail("truncated chunk crc");
    }
    ::uLong want = ::crc32(0L, head + 4, 4);
    if (len != 0) {
      want = ::crc32(want, data.data(), static_cast<::uInt>(len));
    }
    if (readBe32(crc) != static_cast<std::uint32_t>(want)) {
      fail("chunk CRC mismatch");
    }
    if (isIhdr) {
      w = readBe32(data.data());
      h = readBe32(data.data() + 4);
      const int depth = data[8];
      colorType = data[9];
      const int interlace = data[12];
      if (depth != 8) {
        fail("only 8-bit PNGs supported");
      }
      if (interlace != 0) {
        fail("interlaced PNGs not supported");
      }
      switch (colorType) {
        case 0: channels = 1; break;  // gray
        case 2: channels = 3; break;  // RGB
        case 3: channels = 1; break;  // palette
        case 4: channels = 2; break;  // gray + alpha
        case 6: channels = 4; break;  // RGBA
        default: fail("unsupported color type");
      }
      if (w == 0 || h == 0 || w > (1u << 14) || h > (1u << 14)) {
        fail("bad dimensions");
      }
      // Worst-case zlib stream for the raw image: stored blocks add
      // ~5 bytes / 32 KiB plus a small header/trailer.
      const std::size_t rawSize =
          (w * static_cast<std::size_t>(channels) + 1) * h;
      maxIdat = rawSize + rawSize / 1000 + 4096;
    } else if (isPlte) {
      palette = data;
    } else if (isIdat) {
      idat.insert(idat.end(), data.begin(), data.end());
    } else if (std::memcmp(type, "IEND", 4) == 0) {
      break;
    }
    // Ancillary chunks (tEXt, tRNS, ...) are skipped.
  }
  if (colorType < 0 || idat.empty()) {
    fail("missing IHDR/IDAT");
  }
  if (colorType == 3 && palette.empty()) {
    fail("palette image without PLTE");
  }

  const std::size_t bpp = static_cast<std::size_t>(channels);
  const std::size_t rowBytes = w * bpp;
  std::vector<std::uint8_t> raw =
      inflateAll(idat, (rowBytes + 1) * h);

  // De-filter in place into `pixels` (rowBytes * h).
  std::vector<std::uint8_t> pixels(rowBytes * h);
  for (std::size_t y = 0; y < h; ++y) {
    const std::uint8_t filter = raw[y * (rowBytes + 1)];
    const std::uint8_t *src = raw.data() + y * (rowBytes + 1) + 1;
    std::uint8_t *dst = pixels.data() + y * rowBytes;
    const std::uint8_t *up =
        y == 0 ? nullptr : pixels.data() + (y - 1) * rowBytes;
    for (std::size_t x = 0; x < rowBytes; ++x) {
      const std::uint8_t a = x >= bpp ? dst[x - bpp] : 0;
      const std::uint8_t b = up != nullptr ? up[x] : 0;
      const std::uint8_t c =
          (up != nullptr && x >= bpp) ? up[x - bpp] : 0;
      unsigned v = src[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (static_cast<unsigned>(a) + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: fail("bad filter byte");
      }
      dst[x] = static_cast<std::uint8_t>(v);
    }
  }

  // Fold to grayscale keep-map (mean RGB, alpha ignored -- the OBS
  // shim's buildMask fold).
  std::vector<std::uint8_t> gray(w * h);
  for (std::size_t i = 0; i < w * h; ++i) {
    const std::uint8_t *px = pixels.data() + i * bpp;
    switch (colorType) {
      case 0:
      case 4:
        gray[i] = px[0];
        break;
      case 2:
      case 6:
        gray[i] = static_cast<std::uint8_t>(
            (px[0] + px[1] + px[2]) / 3);
        break;
      case 3: {
        const std::size_t idx = px[0] * 3u;
        if (idx + 2 >= palette.size()) {
          fail("palette index out of range");
        }
        gray[i] = static_cast<std::uint8_t>(
            (palette[idx] + palette[idx + 1] + palette[idx + 2]) / 3);
        break;
      }
      default:
        fail("unsupported color type");
    }
  }
  *width = w;
  *height = h;
  return gray;
}

}  // namespace core
}  // namespace JoshUpscale
