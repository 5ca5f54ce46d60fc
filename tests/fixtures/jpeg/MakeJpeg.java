import javax.imageio.*;
import javax.imageio.stream.*;
import java.awt.image.BufferedImage;
import java.awt.image.WritableRaster;
import java.io.*;

// Generates baseline JFIF fixtures with deterministic pixel patterns and
// dumps the decoder's raw samples as the reference for tolerance tests.
// Gray images use the raster directly: setRGB/getRGB on TYPE_BYTE_GRAY
// round-trips through a linear colorspace and corrupts the samples.
public class MakeJpeg {
    static BufferedImage pattern(int w, int h, boolean gray) {
        BufferedImage img = new BufferedImage(w, h,
            gray ? BufferedImage.TYPE_BYTE_GRAY : BufferedImage.TYPE_3BYTE_BGR);
        WritableRaster ras = img.getRaster();
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                int r = (x * 255) / Math.max(1, w - 1);
                int g = (y * 255) / Math.max(1, h - 1);
                int b = ((x + y) % 2 == 0) ? 200 : 40;
                if (gray) ras.setSample(x, y, 0, (r + g) / 2);
                else img.setRGB(x, y, (r<<16)|(g<<8)|b);
            }
        return img;
    }
    static void write(BufferedImage img, String path, float quality) throws Exception {
        ImageWriter w = ImageIO.getImageWritersByFormatName("jpeg").next();
        ImageWriteParam p = w.getDefaultWriteParam();
        p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
        p.setCompressionQuality(quality);
        try (FileOutputStream fos = new FileOutputStream(path);
             ImageOutputStream ios = ImageIO.createImageOutputStream(fos)) {
            w.setOutput(ios);
            w.write(null, new IIOImage(img, null, null), p);
        }
        w.dispose();
    }
    static void dumpSamples(String jpegPath, String outPath) throws Exception {
        BufferedImage img = ImageIO.read(new File(jpegPath));
        int w = img.getWidth(), h = img.getHeight();
        int nc = img.getRaster().getNumBands();
        try (DataOutputStream out = new DataOutputStream(new FileOutputStream(outPath))) {
            for (int y = 0; y < h; y++)
                for (int x = 0; x < w; x++)
                    for (int c = 0; c < nc; c++)
                        out.writeByte(img.getRaster().getSample(x, y, c));
        }
    }
    public static void main(String[] a) throws Exception {
        String d = a[0];
        write(pattern(37, 23, false), d + "/rgb_q85.jpg", 0.85f);
        write(pattern(64, 48, false), d + "/rgb_q95.jpg", 0.95f);
        write(pattern(32, 32, true),  d + "/gray_q90.jpg", 0.90f);
        dumpSamples(d + "/rgb_q85.jpg", d + "/rgb_q85.rgb");
        dumpSamples(d + "/rgb_q95.jpg", d + "/rgb_q95.rgb");
        dumpSamples(d + "/gray_q90.jpg", d + "/gray_q90.rgb");
        System.out.println("ok");
    }
}
