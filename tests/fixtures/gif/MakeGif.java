import javax.imageio.ImageIO;
import java.awt.image.BufferedImage;
import java.io.*;

// GIF fixtures: ImageIO quantizes to a palette and LZW-encodes; its
// decoded RGB output is the exact reference (palette lookup is lossless).
public class MakeGif {
    static BufferedImage pattern(int w, int h) {
        BufferedImage img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB);
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                int r = (x * 255) / Math.max(1, w - 1);
                int g = (y * 255) / Math.max(1, h - 1);
                int b = ((x / 3 + y / 3) % 2 == 0) ? 200 : 40;
                img.setRGB(x, y, (r<<16)|(g<<8)|b);
            }
        return img;
    }
    static void dump(String gifPath, String outPath) throws Exception {
        BufferedImage img = ImageIO.read(new File(gifPath));
        int w = img.getWidth(), h = img.getHeight();
        try (DataOutputStream out = new DataOutputStream(new FileOutputStream(outPath))) {
            for (int y = 0; y < h; y++)
                for (int x = 0; x < w; x++) {
                    int rgb = img.getRGB(x, y);
                    out.writeByte((rgb>>16)&0xFF); out.writeByte((rgb>>8)&0xFF); out.writeByte(rgb&0xFF);
                }
        }
    }
    public static void main(String[] a) throws Exception {
        String d = a[0];
        ImageIO.write(pattern(41, 27), "gif", new File(d + "/grad_41x27.gif"));
        ImageIO.write(pattern(64, 64), "gif", new File(d + "/grad_64x64.gif"));
        dump(d + "/grad_41x27.gif", d + "/grad_41x27.rgb");
        dump(d + "/grad_64x64.gif", d + "/grad_64x64.rgb");
        System.out.println("ok");
    }
}
