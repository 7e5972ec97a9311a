// Native image decode for the host data pipeline (libpng + libjpeg).
//
// The reference feeds its GPU through torch DataLoader workers whose
// decode path is native (PIL's C codecs) behind Python processes
// (reference trainer.py:193-245).  Here the TPU host pipeline uses
// worker *threads* (data/pipeline.py); this library gives those threads
// a decode path with a plain C ABI that ctypes calls GIL-released, so
// PNG/JPEG decompression runs truly in parallel.
//
// Contract (mirrors what the Python loader needs):
//   * RGB output matches PIL `Image.open(p).convert("RGB")` byte-for-byte
//     for gray/palette/RGB/RGBA PNGs (alpha is stripped, not composited —
//     PIL semantics).
//   * Luma output uses PIL's exact ITU-R 601-2 fixed-point rounding
//     ((R*19595 + G*38470 + B*7471 + 0x8000) >> 16).
//
// Build: g++ -O3 -shared -fPIC decode.cpp -lpng -ljpeg (see __init__.py).

#include <png.h>

#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <vector>

#include <jpeglib.h>

extern "C" {
int ssa_image_probe(const unsigned char *buf, long n, int *w, int *h);
int ssa_decode(const unsigned char *buf, long n, unsigned char *out, int w,
               int h, int channels);
}

static const unsigned char PNG_SIG[8] = {0x89, 'P', 'N', 'G',
                                         0x0d, 0x0a, 0x1a, 0x0a};

static bool is_png(const unsigned char *buf, long n) {
  return n >= 8 && memcmp(buf, PNG_SIG, 8) == 0;
}

static bool is_jpeg(const unsigned char *buf, long n) {
  return n >= 3 && buf[0] == 0xFF && buf[1] == 0xD8 && buf[2] == 0xFF;
}

struct JErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void jerr_exit(j_common_ptr cinfo) {
  JErr *e = reinterpret_cast<JErr *>(cinfo->err);
  longjmp(e->jb, 1);
}

static void rgb_to_luma(const unsigned char *rgb, unsigned char *out,
                        long px) {
  // PIL convert("L") fixed point: (R*19595 + G*38470 + B*7471 + 0x8000)>>16
  for (long i = 0; i < px; ++i) {
    unsigned r = rgb[3 * i], g = rgb[3 * i + 1], b = rgb[3 * i + 2];
    out[i] =
        (unsigned char)((r * 19595u + g * 38470u + b * 7471u + 0x8000u) >> 16);
  }
}

// ---------------------------------------------------------------------------
// probe
// ---------------------------------------------------------------------------
static int probe_jpeg(const unsigned char *buf, long n, int *w, int *h) {
  jpeg_decompress_struct cinfo;
  JErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jerr_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char *>(buf),
               (unsigned long)n);
  jpeg_read_header(&cinfo, TRUE);
  *w = (int)cinfo.image_width;
  *h = (int)cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  return 2;
}

int ssa_image_probe(const unsigned char *buf, long n, int *w, int *h) {
  if (is_png(buf, n)) {
    png_image img;
    memset(&img, 0, sizeof img);
    img.version = PNG_IMAGE_VERSION;
    if (!png_image_begin_read_from_memory(&img, buf, (size_t)n)) return 0;
    *w = (int)img.width;
    *h = (int)img.height;
    png_image_free(&img);
    return 1;
  }
  if (is_jpeg(buf, n)) return probe_jpeg(buf, n, w, h);
  return 0;
}

// ---------------------------------------------------------------------------
// png
// ---------------------------------------------------------------------------
static int decode_png(const unsigned char *buf, long n, unsigned char *out,
                      int w, int h, int channels) {
  png_image img;
  memset(&img, 0, sizeof img);
  img.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&img, buf, (size_t)n)) return 2;
  if ((int)img.width != w || (int)img.height != h) {
    png_image_free(&img);
    return 3;
  }
  const long px = (long)w * h;
  const bool gray_src = (img.format & PNG_FORMAT_FLAG_COLOR) == 0;
  const bool has_alpha = (img.format & PNG_FORMAT_FLAG_ALPHA) != 0;

  if (channels == 1 && gray_src && !has_alpha) {
    img.format = PNG_FORMAT_GRAY;  // gray stays gray: exact
    if (!png_image_finish_read(&img, nullptr, out, w, nullptr)) return 4;
    return 0;
  }

  // expand everything else to RGBA (libpng palette/gray expansion matches
  // PIL's), then strip alpha / reduce to luma
  img.format = PNG_FORMAT_RGBA;
  std::vector<unsigned char> tmp((size_t)px * 4);
  if (!png_image_finish_read(&img, nullptr, tmp.data(), w * 4, nullptr))
    return 4;
  if (channels == 3) {
    for (long i = 0; i < px; ++i) {
      out[3 * i] = tmp[4 * i];
      out[3 * i + 1] = tmp[4 * i + 1];
      out[3 * i + 2] = tmp[4 * i + 2];
    }
    return 0;
  }
  if (channels == 1) {
    for (long i = 0; i < px; ++i) {
      unsigned r = tmp[4 * i], g = tmp[4 * i + 1], b = tmp[4 * i + 2];
      out[i] = (unsigned char)(
          (r * 19595u + g * 38470u + b * 7471u + 0x8000u) >> 16);
    }
    return 0;
  }
  return 5;
}

// ---------------------------------------------------------------------------
// jpeg
// ---------------------------------------------------------------------------
static int decode_jpeg(const unsigned char *buf, long n, unsigned char *out,
                       int w, int h, int channels) {
  jpeg_decompress_struct cinfo;
  JErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jerr_exit;
  std::vector<unsigned char> rgb;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return 4;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char *>(buf), (unsigned long)n);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;  // PIL decodes RGB then converts
  jpeg_start_decompress(&cinfo);
  if ((int)cinfo.output_width != w || (int)cinfo.output_height != h) {
    jpeg_destroy_decompress(&cinfo);
    return 3;
  }
  const long px = (long)w * h;
  unsigned char *dst = out;
  if (channels == 1) {
    rgb.resize((size_t)px * 3);
    dst = rgb.data();
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char *row = dst + (size_t)cinfo.output_scanline * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  if (channels == 1) rgb_to_luma(rgb.data(), out, px);
  return 0;
}

// ---------------------------------------------------------------------------
// entry
// ---------------------------------------------------------------------------
int ssa_decode(const unsigned char *buf, long n, unsigned char *out, int w,
               int h, int channels) {
  if (channels != 1 && channels != 3) return 6;
  if (is_png(buf, n)) return decode_png(buf, n, out, w, h, channels);
  if (is_jpeg(buf, n)) return decode_jpeg(buf, n, out, w, h, channels);
  return 1;
}
