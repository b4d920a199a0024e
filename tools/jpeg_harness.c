/* Cross-check harness against the system libjpeg (dev/test-time only;
 * compiled on demand by JpegRealStreamSpec — gcc + libjpeg62-turbo are
 * in this container). Two modes:
 *
 *   gen OUT.jpg w h kind seed quality gray|color base|prog restart subsamp
 *     encode a deterministic synthetic image with the REAL libjpeg
 *     encoder: quality sweep, optional progressive scan script
 *     (jpeg_simple_progression), restart intervals (DRI/RSTn), 4:2:0 or
 *     4:4:4 subsampling, optimized (custom) Huffman tables.
 *
 *   coef IN.jpg OUT.bin
 *     dump the QUANTIZED DCT coefficients via jpeg_read_coefficients —
 *     the entropy layer's exact output, which T.81 pins down (unlike
 *     the IDCT), so it is byte-comparable across implementations.
 *     Format: i32 ncomp, then per component i32 wblocks, i32 hblocks,
 *     then hblocks*wblocks blocks of 64 i16 in natural order.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static unsigned int lcg_state;
static unsigned char lcg_next(void) {
  lcg_state = lcg_state * 1664525u + 1013904223u;
  return (lcg_state >> 16) & 0xff;
}

static void fill_pixel(int x, int y, int seed, const char *kind,
                       unsigned char *rgb) {
  if (strcmp(kind, "noise") == 0) {
    rgb[0] = lcg_next(); rgb[1] = lcg_next(); rgb[2] = lcg_next();
  } else if (strcmp(kind, "grad") == 0) {
    rgb[0] = (x * 4 + seed) % 256;
    rgb[1] = (y * 3 + 2 * seed) % 256;
    rgb[2] = (x + y + 3 * seed) % 256;
  } else if (strcmp(kind, "blocks") == 0) {
    int t = ((x / 8) * 31 + (y / 8) * 17 + seed) % 256;
    rgb[0] = t; rgb[1] = (t * 3) % 256; rgb[2] = 255 - t;
  } else { /* photo-ish */
    rgb[0] = (x * 2 + y + lcg_next() % 9 + seed) % 256;
    rgb[1] = (x + y * 2 + lcg_next() % 7) % 256;
    rgb[2] = ((x * x) / 16 + y * 3 + lcg_next() % 5) % 256;
  }
}

static int do_gen(int argc, char **argv) {
  const char *out = argv[2];
  int w = atoi(argv[3]), h = atoi(argv[4]);
  const char *kind = argv[5];
  int seed = atoi(argv[6]);
  int quality = atoi(argv[7]);
  int gray = strcmp(argv[8], "gray") == 0;
  int prog = strcmp(argv[9], "prog") == 0;
  int restart = atoi(argv[10]);
  int h2v2 = strcmp(argv[11], "420") == 0;

  struct jpeg_compress_struct cinfo;
  struct jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_compress(&cinfo);
  FILE *f = fopen(out, "wb");
  if (!f) { perror("open"); return 1; }
  jpeg_stdio_dest(&cinfo, f);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = gray ? 1 : 3;
  cinfo.in_color_space = gray ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  cinfo.optimize_coding = (seed % 2) ? TRUE : FALSE; /* custom tables half the time */
  cinfo.restart_interval = restart;
  if (!gray) {
    cinfo.comp_info[0].h_samp_factor = h2v2 ? 2 : 1;
    cinfo.comp_info[0].v_samp_factor = h2v2 ? 2 : 1;
    cinfo.comp_info[1].h_samp_factor = 1;
    cinfo.comp_info[1].v_samp_factor = 1;
    cinfo.comp_info[2].h_samp_factor = 1;
    cinfo.comp_info[2].v_samp_factor = 1;
  }
  if (prog) jpeg_simple_progression(&cinfo);
  jpeg_start_compress(&cinfo, TRUE);
  lcg_state = (unsigned int)seed;
  unsigned char *row = malloc((size_t)w * (gray ? 1 : 3));
  for (int y = 0; y < h; y++) {
    for (int x = 0; x < w; x++) {
      unsigned char rgb[3];
      fill_pixel(x, y, seed, kind, rgb);
      if (gray) row[x] = rgb[0];
      else { row[x * 3] = rgb[0]; row[x * 3 + 1] = rgb[1]; row[x * 3 + 2] = rgb[2]; }
    }
    JSAMPROW rp = row;
    jpeg_write_scanlines(&cinfo, &rp, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  fclose(f);
  free(row);
  return 0;
}

static int do_coef(int argc, char **argv) {
  FILE *in = fopen(argv[2], "rb");
  FILE *out = fopen(argv[3], "wb");
  if (!in || !out) { perror("open"); return 1; }
  struct jpeg_decompress_struct cinfo;
  struct jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, in);
  jpeg_read_header(&cinfo, TRUE);
  jvirt_barray_ptr *coefs = jpeg_read_coefficients(&cinfo);
  int ncomp = cinfo.num_components;
  fwrite(&ncomp, 4, 1, out);
  for (int ci = 0; ci < ncomp; ci++) {
    jpeg_component_info *comp = &cinfo.comp_info[ci];
    int wb = (int)comp->width_in_blocks;
    int hb = (int)comp->height_in_blocks;
    fwrite(&wb, 4, 1, out);
    fwrite(&hb, 4, 1, out);
    for (int by = 0; by < hb; by++) {
      JBLOCKARRAY rows = (cinfo.mem->access_virt_barray)(
          (j_common_ptr)&cinfo, coefs[ci], by, 1, FALSE);
      for (int bx = 0; bx < wb; bx++)
        fwrite(rows[0][bx], sizeof(JCOEF), DCTSIZE2, out);
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(in);
  fclose(out);
  return 0;
}

int main(int argc, char **argv) {
  if (argc >= 12 && strcmp(argv[1], "gen") == 0) return do_gen(argc, argv);
  if (argc >= 4 && strcmp(argv[1], "coef") == 0) return do_coef(argc, argv);
  fprintf(stderr, "usage: gen OUT w h kind seed q gray|color base|prog "
                  "restart 420|444 | coef IN OUT\n");
  return 2;
}
