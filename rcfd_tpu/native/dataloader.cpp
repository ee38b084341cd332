// Native data-loader for the TPU radar-camera-fusion-depth framework.
//
// Hot-path host I/O: 16/32-bit grayscale PNG depth/response codecs
// (byte-compatible with the reference's PIL 'I'-mode x256 / x2^14 format,
// reference src/data_utils.py:238-335), 8-bit RGB image decode (JPEG/PNG
// — nuScenes camera frames are JPEG), and a std::thread batch decoder that
// fills preallocated buffers outside the Python GIL. Exposed as a C ABI
// for ctypes (pybind11 is not available in this image).
//
// Build: rcfd_tpu/native/build.py (g++ -O3 -shared -fPIC, links
// libpng/libjpeg/libz).

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

// libjpeg's default error handler calls exit(); from a worker thread in
// rcfd_batch_read that would abort the whole process on one corrupt JPEG.
// Install a longjmp-based handler (the documented libjpeg recovery
// pattern, mirroring the PNG setjmp paths) so bad files return an error.
namespace {
struct RcfdJpegErr {
  jpeg_error_mgr pub;
  jmp_buf jmp;
};

void rcfd_jpeg_error_exit(j_common_ptr cinfo) {
  RcfdJpegErr* err = reinterpret_cast<RcfdJpegErr*>(cinfo->err);
  longjmp(err->jmp, 1);
}
}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// PNG: 16/32-bit grayscale depth maps
// ---------------------------------------------------------------------------

// Reads a grayscale PNG of bit depth 8/16 (PIL 'I' mode writes 32-bit data
// as 16-bit grayscale when values fit, else "I" chunks; the reference's
// save path produces 16-bit). Returns 0 on success.
// On success *out_h/*out_w are set; caller passes a buffer of size h*w
// obtained from rcfd_png_probe.
int rcfd_png_probe(const char* path, int* out_h, int* out_w) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return -1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return -2;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  *out_h = png_get_image_height(png, info);
  *out_w = png_get_image_width(png, info);
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return 0;
}

// Decode a grayscale PNG into float32 out[h*w], dividing by `multiplier`
// and zeroing non-positive values (reference load_depth semantics).
int rcfd_png_read_depth(const char* path, float multiplier, float* out,
                        int h, int w) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return -1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return -2;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  int height = png_get_image_height(png, info);
  int width = png_get_image_width(png, info);
  int bit_depth = png_get_bit_depth(png, info);
  int color_type = png_get_color_type(png, info);
  if (height != h || width != w || color_type != PNG_COLOR_TYPE_GRAY) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return -3;
  }
  if (bit_depth != 16 && bit_depth != 8) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return -4;
  }
  if (bit_depth == 16) png_set_swap(png);  // BE on the wire -> host LE
  png_read_update_info(png, info);

  const float inv = 1.0f / multiplier;
  const size_t rowbytes = png_get_rowbytes(png, info);
  std::vector<png_byte> buf(rowbytes * height);
  std::vector<png_bytep> rows(height);
  for (int y = 0; y < height; ++y) rows[y] = buf.data() + rowbytes * y;
  png_read_image(png, rows.data());

  const size_t n = (size_t)height * width;
  if (bit_depth == 16) {
    const uint16_t* src = reinterpret_cast<const uint16_t*>(buf.data());
    for (size_t i = 0; i < n; ++i) {
      float f = src[i] * inv;
      out[i] = f > 0.0f ? f : 0.0f;
    }
  } else {
    const uint8_t* src = buf.data();
    for (size_t i = 0; i < n; ++i) {
      float f = src[i] * inv;
      out[i] = f > 0.0f ? f : 0.0f;
    }
  }
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return 0;
}

// Encode float32 depth[h*w] as a 16-bit grayscale PNG quantized by
// multiplier (truncation like np.uint32(z * m), reference save_depth).
int rcfd_png_write_depth(const char* path, float multiplier,
                         const float* depth, int h, int w) {
  FILE* fp = fopen(path, "wb");
  if (!fp) return -1;
  png_structp png =
      png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info);
    fclose(fp);
    return -2;
  }
  png_init_io(png, fp);
  png_set_IHDR(png, info, w, h, 16, PNG_COLOR_TYPE_GRAY, PNG_INTERLACE_NONE,
               PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
  png_write_info(png, info);
  std::vector<png_byte> row((size_t)w * 2);
  for (int y = 0; y < h; ++y) {
    const float* src = depth + (size_t)y * w;
    for (int x = 0; x < w; ++x) {
      uint32_t q = (uint32_t)(src[x] * multiplier);
      uint16_t v = q > 65535u ? 65535u : (uint16_t)q;
      row[2 * x] = (png_byte)(v >> 8);
      row[2 * x + 1] = (png_byte)(v & 0xff);
    }
    png_write_row(png, row.data());
  }
  png_write_end(png, nullptr);
  png_destroy_write_struct(&png, &info);
  fclose(fp);
  return 0;
}

// ---------------------------------------------------------------------------
// JPEG/PNG RGB images
// ---------------------------------------------------------------------------

int rcfd_image_probe(const char* path, int* out_h, int* out_w) {
  // sniff magic bytes
  FILE* fp = fopen(path, "rb");
  if (!fp) return -1;
  unsigned char magic[8] = {0};
  size_t n = fread(magic, 1, 8, fp);
  fclose(fp);
  if (n < 8) return -2;
  if (magic[0] == 0xFF && magic[1] == 0xD8) {  // JPEG
    FILE* f = fopen(path, "rb");
    jpeg_decompress_struct cinfo;
    RcfdJpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = rcfd_jpeg_error_exit;
    if (setjmp(jerr.jmp)) {
      jpeg_destroy_decompress(&cinfo);
      fclose(f);
      return -4;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    *out_h = cinfo.image_height;
    *out_w = cinfo.image_width;
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 0;
  }
  if (png_sig_cmp(magic, 0, 8) == 0) {
    return rcfd_png_probe(path, out_h, out_w);
  }
  return -3;
}

// Decode an RGB image (JPEG or PNG) into float32 out[h*w*3] in [0, 255].
int rcfd_image_read_rgb(const char* path, float* out, int h, int w) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return -1;
  unsigned char magic[8] = {0};
  size_t n = fread(magic, 1, 8, fp);
  fseek(fp, 0, SEEK_SET);
  if (n < 8) {
    fclose(fp);
    return -2;
  }

  if (magic[0] == 0xFF && magic[1] == 0xD8) {  // JPEG
    jpeg_decompress_struct cinfo;
    RcfdJpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = rcfd_jpeg_error_exit;
    // allocated before setjmp so the longjmp never skips its destructor
    std::vector<unsigned char> row((size_t)w * 3);
    if (setjmp(jerr.jmp)) {
      jpeg_destroy_decompress(&cinfo);
      fclose(fp);
      return -6;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, fp);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    if ((int)cinfo.output_height != h || (int)cinfo.output_width != w ||
        cinfo.output_components != 3) {
      jpeg_destroy_decompress(&cinfo);
      fclose(fp);
      return -3;
    }
    unsigned char* rowp = row.data();
    while (cinfo.output_scanline < cinfo.output_height) {
      int y = cinfo.output_scanline;
      jpeg_read_scanlines(&cinfo, &rowp, 1);
      float* dst = out + (size_t)y * w * 3;
      for (int i = 0; i < w * 3; ++i) dst[i] = (float)row[i];
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return 0;
  }

  if (png_sig_cmp(magic, 0, 8) == 0) {
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                             nullptr, nullptr);
    png_infop info = png_create_info_struct(png);
    if (setjmp(png_jmpbuf(png))) {
      png_destroy_read_struct(&png, &info, nullptr);
      fclose(fp);
      return -4;
    }
    png_init_io(png, fp);
    png_read_info(png, info);
    if ((int)png_get_image_height(png, info) != h ||
        (int)png_get_image_width(png, info) != w) {
      png_destroy_read_struct(&png, &info, nullptr);
      fclose(fp);
      return -3;
    }
    // normalize to 8-bit RGB
    png_set_strip_16(png);
    png_set_palette_to_rgb(png);
    png_set_expand_gray_1_2_4_to_8(png);
    png_set_gray_to_rgb(png);
    png_set_strip_alpha(png);
    png_read_update_info(png, info);
    std::vector<png_byte> row(png_get_rowbytes(png, info));
    for (int y = 0; y < h; ++y) {
      png_read_row(png, row.data(), nullptr);
      float* dst = out + (size_t)y * w * 3;
      for (int i = 0; i < w * 3; ++i) dst[i] = (float)row[i];
    }
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return 0;
  }
  fclose(fp);
  return -5;
}

// ---------------------------------------------------------------------------
// Threaded batch decode (fills a preallocated batch buffer)
// ---------------------------------------------------------------------------

// paths: `count` zero-separated strings concatenated. kind: 0 = depth PNG
// (uses multiplier), 1 = RGB image. out has count * plane floats.
int rcfd_batch_read(const char* paths, int count, int kind, float multiplier,
                    float* out, int h, int w, int n_threads) {
  std::vector<const char*> ptrs(count);
  const char* p = paths;
  for (int i = 0; i < count; ++i) {
    ptrs[i] = p;
    p += strlen(p) + 1;
  }
  const size_t plane = (size_t)h * w * (kind == 1 ? 3 : 1);
  std::vector<int> status(count, 0);
  if (n_threads < 1) n_threads = 1;

  auto worker = [&](int tid) {
    for (int i = tid; i < count; i += n_threads) {
      if (kind == 0) {
        status[i] =
            rcfd_png_read_depth(ptrs[i], multiplier, out + plane * i, h, w);
      } else {
        status[i] = rcfd_image_read_rgb(ptrs[i], out + plane * i, h, w);
      }
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker, t);
  for (auto& t : threads) t.join();
  for (int i = 0; i < count; ++i)
    if (status[i] != 0) return status[i];
  return 0;
}

}  // extern "C"
