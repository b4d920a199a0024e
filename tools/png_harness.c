/* PNG cross-check harness against the system libpng (dev/test-time
 * only; compiled on demand by PngRealStreamSpec). Two modes:
 *
 *   gen OUT.png w h ct depth interlace seed trns
 *     encode a deterministic synthetic image with the REAL libpng
 *     encoder: color type 0/2/3/4/6, its legal bit depths, optional
 *     Adam7 interlacing, optional tRNS (palette alpha / color key).
 *
 *   rgba IN.png OUT.bin
 *     decode through libpng's canonical expansion — palette->RGB,
 *     gray 1/2/4 -> 8, tRNS -> alpha, 16 -> strip to high byte,
 *     gray->RGB, opaque filler — and dump w*h RGBA bytes. This is the
 *     semantic graft's decodePng implements, so the planes must match
 *     byte-for-byte.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <png.h>

static unsigned int lcg_state;
static unsigned char lcg_next(void) {
  lcg_state = lcg_state * 1664525u + 1013904223u;
  return (lcg_state >> 16) & 0xff;
}

static int do_gen(char **argv) {
  const char *out = argv[2];
  int w = atoi(argv[3]), h = atoi(argv[4]);
  int ct = atoi(argv[5]), depth = atoi(argv[6]);
  int interlace = atoi(argv[7]) ? PNG_INTERLACE_ADAM7 : PNG_INTERLACE_NONE;
  int seed = atoi(argv[8]);
  int want_trns = atoi(argv[9]);

  FILE *f = fopen(out, "wb");
  if (!f) { perror("open"); return 1; }
  png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING, 0, 0, 0);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) return 1;
  png_init_io(png, f);
  png_set_IHDR(png, info, w, h, depth, ct, interlace,
               PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
  int nchan = (ct == 0 || ct == 3) ? 1 : (ct == 2 ? 3 : (ct == 4 ? 2 : 4));
  int npal = 0;
  if (ct == 3) {
    npal = depth == 1 ? 2 : (depth == 2 ? 4 : (depth == 4 ? 13 : 200));
    png_color pal[256];
    for (int i = 0; i < npal; i++) {
      pal[i].red = (i * 37 + seed) % 256;
      pal[i].green = (i * 59 + 2 * seed) % 256;
      pal[i].blue = (i * 83 + 3 * seed) % 256;
    }
    png_set_PLTE(png, info, pal, npal);
    if (want_trns) {
      png_byte ta[256];
      int nt = npal > 5 ? npal - 3 : npal; /* some entries stay opaque */
      for (int i = 0; i < nt; i++) ta[i] = (i * 29 + seed) % 256;
      png_set_tRNS(png, info, ta, nt, 0);
    }
  } else if (want_trns && (ct == 0 || ct == 2)) {
    png_color_16 key;
    memset(&key, 0, sizeof key);
    int maxv = depth == 16 ? 65535 : (1 << depth) - 1;
    key.gray = (seed * 7) % (maxv + 1);
    key.red = (seed * 7) % (maxv + 1);
    key.green = (seed * 11) % (maxv + 1);
    key.blue = (seed * 13) % (maxv + 1);
    png_set_tRNS(png, info, 0, 0, &key);
  }
  png_write_info(png, info);
  if (depth < 8) png_set_packing(png); /* we supply 1 byte per sample */
  int npasses = png_set_interlace_handling(png); /* 1 or 7 */
  lcg_state = (unsigned int)seed;
  int bytes_per_sample = depth == 16 ? 2 : 1;
  size_t rowlen = (size_t)w * nchan * bytes_per_sample;
  png_bytep img = malloc(rowlen * h);
  int maxv = (1 << (depth > 8 ? 8 : depth)) - 1; /* low byte range */
  for (int y = 0; y < h; y++) {
    png_bytep q = img + rowlen * y;
    for (int x = 0; x < w; x++) {
      for (int c = 0; c < nchan; c++) {
        if (ct == 3) {
          *q++ = (x * 3 + y * 5 + seed + (lcg_next() & 3)) % npal;
        } else if (depth == 16) {
          *q++ = lcg_next();
          *q++ = lcg_next();
        } else {
          *q++ = lcg_next() & maxv;
        }
      }
    }
  }
  for (int pass = 0; pass < npasses; pass++)
    for (int y = 0; y < h; y++)
      png_write_row(png, img + rowlen * y);
  png_write_end(png, info);
  png_destroy_write_struct(&png, &info);
  fclose(f);
  free(img);
  return 0;
}

static int do_rgba(char **argv) {
  FILE *in = fopen(argv[2], "rb");
  FILE *out = fopen(argv[3], "wb");
  if (!in || !out) { perror("open"); return 1; }
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, 0, 0, 0);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) return 1;
  png_init_io(png, in);
  png_read_info(png, info);
  png_set_expand(png);            /* palette->rgb, gray<8 ->8, tRNS->alpha */
  png_set_strip_16(png);          /* high byte */
  png_set_gray_to_rgb(png);
  png_set_filler(png, 0xff, PNG_FILLER_AFTER);
  int passes = png_set_interlace_handling(png);
  (void)passes;
  png_read_update_info(png, info);
  int w = png_get_image_width(png, info);
  int h = png_get_image_height(png, info);
  png_bytep *rows = malloc(sizeof(png_bytep) * h);
  for (int y = 0; y < h; y++) rows[y] = malloc((size_t)w * 4);
  png_read_image(png, rows);
  for (int y = 0; y < h; y++) { fwrite(rows[y], 1, (size_t)w * 4, out); free(rows[y]); }
  png_destroy_read_struct(&png, &info, 0);
  fclose(in);
  fclose(out);
  free(rows);
  return 0;
}

int main(int argc, char **argv) {
  if (argc >= 10 && strcmp(argv[1], "gen") == 0) return do_gen(argv);
  if (argc >= 4 && strcmp(argv[1], "rgba") == 0) return do_rgba(argv);
  fprintf(stderr, "usage: gen OUT w h ct depth interlace seed trns | rgba IN OUT\n");
  return 2;
}
